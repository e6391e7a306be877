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
