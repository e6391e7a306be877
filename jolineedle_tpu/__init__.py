"""JoliNeedle-TPU: a TPU-native (JAX/XLA/Pallas) glimpse-based object detection
framework with the capabilities of jolibrain/jolineedle.

A decision model (small GPT-style causal decoder) navigates a grid of square
patches over a very large image; a detection model (YOLOX, reimplemented in
JAX) runs only on the visited patches. Both are trained jointly, either
supervised (imitating shortest-path trajectories) or with REINFORCE.

Design notes (TPU-first, not a port):
  - All compute-path code is jit-compiled JAX; the batched glimpse environment
    is a pure pytree `EnvState` with a `step` function, and RL rollouts run
    fully on-device inside a `lax.scan` with masked early-stop (the reference
    loops in Python on the host, reference: src/reinforce.py:150-184).
  - The GPT decoder uses a real KV cache threaded through the rollout scan
    (strictly stronger than the reference's embedding-only cache,
    reference: src/models/gpt.py:427-435).
  - Data parallelism is GSPMD over a `jax.sharding.Mesh` (the reference uses
    torch DDP/NCCL, reference: src/trainer.py:61-71).
"""

__version__ = "0.1.0"

import os as _os


def honor_env_platforms() -> None:
    """Make ``JAX_PLATFORMS=cpu`` actually mean cpu.

    The axon TPU plugin's sitecustomize presets ``jax_platforms`` to
    ``"axon,cpu"`` at interpreter startup, silently overriding the user's
    environment. Re-apply the environment value — but never step on a
    platform selected programmatically (e.g. the test conftest pins cpu via
    ``jax.config`` before importing this package). Must run before JAX
    backends initialize.
    """
    import jax

    env = _os.environ.get("JAX_PLATFORMS")
    cfg = jax.config.jax_platforms or ""
    plugin_controlled = not cfg or "axon" in cfg.split(",")
    if env and cfg.split(",")[0] != env and plugin_controlled:
        try:
            jax.config.update("jax_platforms", env)
        except Exception:
            pass


honor_env_platforms()


def enable_compilation_cache(path: str = "") -> None:
    """Turn on JAX's persistent compilation cache.

    XLA compiles are the dominant startup cost of every CLI entry (especially
    the scan-rollout train step); caching them across processes makes
    repeated runs — tests, resumed trainings, inference — start in seconds.
    Set ``JOLINEEDLE_NO_CACHE=1`` to disable.
    """
    if _os.environ.get("JOLINEEDLE_NO_CACHE"):
        return
    import jax

    path = path or _os.environ.get(
        "JOLINEEDLE_CACHE_DIR", "/tmp/jolineedle_jax_cache"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


enable_compilation_cache()
