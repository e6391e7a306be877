"""Regenerate the 1.5k-image toy dataset used by the round-2 experiments.

The experiment log's "1.5k set" (`/root/toyds_big`) is ephemeral (lives
outside the repo and machine resets wipe it); this pins the exact recipe so
any session can reproduce it deterministically:

    python scripts/make_toyds_big.py [out_dir]

1,500 train / 150 test context-glow images, 320x448 (5x7 grid at patch 64
-- an 8-step-reachable analog of LARD's 6x6 448px grid), seed 0.
Takes ~4 min on one host core.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from jolineedle_tpu.data.toy import generate_toy_dataset  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "out_dir", nargs="?", default="/root/toyds_big",
        help="destination directory (default: /root/toyds_big)",
    )
    parser.add_argument(
        "--box-size", nargs=2, type=int, default=(30, 120),
        metavar=("MIN", "MAX"),
        help="target edge-length range in px; 12 40 gives the LARD-like "
        "sub-patch box/patch ratio variant (/root/toyds_lardlike)",
    )
    parser.add_argument(
        "--runway", action="store_true",
        help="LARD runway TOPOLOGY variant (/root/toyds_runway): one "
        "elongated contiguous target spanning 3-6 patches in a line per "
        "image (overrides --box-size)",
    )
    args = parser.parse_args()
    path = generate_toy_dataset(
        args.out_dir,
        n_train=1500,
        n_test=150,
        image_size=(320, 448),
        seed=0,
        context=True,
        box_size=tuple(args.box_size),
        runway=args.runway,
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
