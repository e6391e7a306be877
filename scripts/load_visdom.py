#!/usr/bin/python3
"""Push a pickled dashboard state back onto a live visdom server.

Trainers persist their dashboard as ``<work_dir>/<env>/visdom.pkl``
(observe/visualizer.py); after a server restart this script restores every
line plot, image panel, and table from that pickle. Covers the same
capability as the reference's visdom reload script (reference:
scripts/load_visdom.py:1-38) with this repo's plotter.

Usage:
    python scripts/load_visdom.py runs/my_exp/visdom.pkl
    python scripts/load_visdom.py state.pkl --env_name my_exp -v
"""

import argparse
import logging
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from jolineedle_tpu.observe.visualizer import VisdomPlotter  # noqa: E402


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Restore a saved visdom.pkl dashboard onto a running "
        "visdom server."
    )
    parser.add_argument("file", help="path to the pickled dashboard state")
    parser.add_argument(
        "--env_name",
        default=None,
        help="visdom environment to publish into (default: the pickle's "
        "parent directory name, i.e. the run's env)",
    )
    parser.add_argument(
        "-v",
        "--verbose",
        action="store_true",
        help="enable INFO-level logging",
    )
    return parser.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO if args.verbose else logging.WARNING)

    env = args.env_name or pathlib.Path(args.file).resolve().parent.name
    logging.info("republishing %s into env %r", args.file, env)
    VisdomPlotter.load(args.file, env).republish()


if __name__ == "__main__":
    main()
