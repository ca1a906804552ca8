"""Estimator fine-tuning CLI (reference fine_tune.py):

    python -m accflow_tpu.cli.fine_tune -c configs/RAFT.yml
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", "-c", type=str, default="./configs/RAFT.yml")
    parser.add_argument("--max-steps", type=int, default=None)
    args = parser.parse_args(argv)

    from accflow_tpu.train.finetune import fine_tune
    from accflow_tpu.utils.config import parse_options

    opt = parse_options(args.config)
    fine_tune(opt, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
