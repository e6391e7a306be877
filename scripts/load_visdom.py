#!/usr/bin/python3
"""Re-publish a saved ``visdom.pkl`` to a running visdom server
(reference: scripts/load_visdom.py:1-38)."""

import argparse
import logging
import os
import sys

sys.path.append(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from jolineedle_tpu.observe.visualizer import VisdomPlotter  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="Take visdom file and send it to the server"
    )
    parser.add_argument("file", help="Visdom file to reload")
    parser.add_argument(
        "-v", "--verbose", action="store_true", help="Set logging level to INFO"
    )
    parser.add_argument("--env_name", type=str, help="Name of the environment")
    args = parser.parse_args()

    if args.verbose:
        logging.basicConfig(level=logging.INFO)

    if not args.env_name:
        args.env_name = os.path.basename(os.path.dirname(args.file))

    visdom = VisdomPlotter.load(args.file, args.env_name)
    visdom.republish()


if __name__ == "__main__":
    main()
