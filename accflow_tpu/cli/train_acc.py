"""Accumulator training CLI (reference train_acc.py):

    python -m accflow_tpu.cli.train_acc -c configs/AccRAFT.yml
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", "-c", type=str, default="./configs/AccRAFT.yml")
    parser.add_argument("--max-steps", type=int, default=None)
    args = parser.parse_args(argv)

    from accflow_tpu.train.engine import train_acc
    from accflow_tpu.utils.config import parse_options

    opt = parse_options(args.config)
    train_acc(opt, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
