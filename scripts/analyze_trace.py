"""Decompose a jax.profiler trace op-class-by-op-class (round-3 verdict
item 5: close the part-bench arithmetic with a real per-op accounting
instead of a "consistent with" argument).

Usage:
    python scripts/analyze_trace.py /tmp/bench_trace [--top N]

Reads every ``*.xplane.pb`` under the directory, finds the device plane(s)
(TPU/axon), and aggregates per-op exclusive time by the op's HLO category
(convolution / fusion / reduce / copy / dynamic-slice / ...) and by op name
within each category. Host planes are ignored — the question is device-step
composition, not client dispatch.

Pure host-side analysis: no JAX import, safe to run while the chip trains.
"""

import argparse
import collections
import glob
import os
import sys

# The installed tensorboard_plugin_profile wheel is incompatible with this
# tf build (missing pywrap symbol), so parse the XSpace proto directly.
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402


def load_xspaces(trace_dir):
    paths = sorted(
        glob.glob(
            os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
        )
    )
    if not paths:
        sys.exit(f"no *.xplane.pb under {trace_dir}")
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def is_device_plane(name: str) -> bool:
    n = name.lower()
    return ("tpu" in n or "device" in n or "axon" in n) and "host" not in n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument(
        "--plane", default=None,
        help="substring filter for plane names (default: device planes)",
    )
    ap.add_argument(
        "--list", action="store_true", help="just list planes and lines"
    )
    args = ap.parse_args()

    spaces = load_xspaces(args.trace_dir)

    if args.list:
        for path, xs in spaces:
            print(path)
            for plane in xs.planes:
                lines = ", ".join(
                    f"{ln.name}({len(ln.events)})" for ln in plane.lines
                )
                print(f"  plane {plane.name!r}: {lines}")
        return

    # category -> total ps; (category, op name) -> total ps
    by_cat = collections.Counter()
    by_op = collections.Counter()
    occurrences = collections.Counter()
    total_ps = 0

    for path, xs in spaces:
        for plane in xs.planes:
            if args.plane is not None:
                if args.plane not in plane.name:
                    continue
            elif not is_device_plane(plane.name):
                continue
            emeta = plane.event_metadata
            smeta = plane.stat_metadata
            for line in plane.lines:
                lname = line.name.lower()
                # Per-op lines only: step lines double-count whole steps.
                if "step" in lname:
                    continue
                for ev in line.events:
                    md = emeta.get(ev.metadata_id)
                    name = md.name if md else str(ev.metadata_id)
                    dur = ev.duration_ps
                    cat = None
                    for st in list(ev.stats) + (
                        list(md.stats) if md else []
                    ):
                        sm = smeta.get(st.metadata_id)
                        if sm and sm.name in (
                            "hlo_category", "equation", "category"
                        ):
                            if st.WhichOneof("value") == "str_value":
                                cat = st.str_value
                            elif st.WhichOneof("value") == "ref_value":
                                sv = smeta.get(st.ref_value)
                                cat = sv.name if sv else None
                            if cat:
                                break
                    if cat is None:
                        # Fall back to a crude name-based class.
                        n = name.lower()
                        for k in (
                            "convolution", "fusion", "copy", "dynamic-slice",
                            "dynamic-update-slice", "reduce", "dot", "rng",
                            "transpose", "gather", "scatter", "while",
                            "all-reduce", "select", "iota", "broadcast",
                        ):
                            if k in n:
                                cat = k
                                break
                        else:
                            cat = "other"
                    by_cat[cat] += dur
                    by_op[(cat, name)] += dur
                    occurrences[(cat, name)] += 1
                    total_ps += dur

    if total_ps == 0:
        print("no device-plane op events found; rerun with --list to see "
              "available planes, then pass --plane SUBSTRING")
        return

    print(f"total device op time: {total_ps / 1e9:.3f} ms "
          f"(exclusive, summed over op events)\n")
    print(f"{'category':28s} {'ms':>10s} {'%':>6s}")
    for cat, ps in by_cat.most_common():
        print(f"{cat:28s} {ps / 1e9:10.3f} {100 * ps / total_ps:6.1f}")

    print(f"\ntop {args.top} ops:")
    print(f"{'category':20s} {'n':>6s} {'ms':>10s} {'%':>6s}  op")
    for (cat, name), ps in by_op.most_common(args.top):
        print(
            f"{cat:20s} {occurrences[(cat, name)]:6d} {ps / 1e9:10.3f} "
            f"{100 * ps / total_ps:6.1f}  {name[:70]}"
        )


if __name__ == "__main__":
    main()
