"""Convert reference .pth checkpoints to accflow_tpu .npz param files.

    # estimator checkpoints (raft-things.pth, gma-cvo.pth, ...)
    python -m accflow_tpu.cli.convert_ckpt --pth raft-things.pth \
        --model raft --out raft-things.npz

    # full AccFlow checkpoints (acc+raft-things.pth, ...) -> two files
    python -m accflow_tpu.cli.convert_ckpt --pth acc+raft-things.pth \
        --model acc+raft --out acc-raft-things
"""

from __future__ import annotations

import argparse

import jax


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--pth", required=True)
    parser.add_argument("--model", required=True,
                        help="raft | gma | acc+raft | acc+gma")
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)

    from accflow_tpu.convert.store import save_params
    from accflow_tpu.convert.torch_weights import (
        load_accflow_checkpoint,
        load_flow_estimator_checkpoint,
    )
    from accflow_tpu.models import build_flow_estimator

    est = build_flow_estimator(args.model)
    template = est.init(jax.random.PRNGKey(0))

    if "acc" in args.model:
        from accflow_tpu.models.accflow import AccFlowConfig, init_accflow

        acc_template = init_accflow(jax.random.PRNGKey(1), AccFlowConfig())
        acc_params, ofe_params = load_accflow_checkpoint(
            args.pth, acc_template, template
        )
        out = args.out.removesuffix(".npz")
        save_params(out + ".acc.npz", acc_params)
        save_params(out + ".ofe.npz", ofe_params)
        print(f"wrote {out}.acc.npz and {out}.ofe.npz")
    else:
        params = load_flow_estimator_checkpoint(args.pth, template)
        out = args.out if args.out.endswith(".npz") else args.out + ".npz"
        save_params(out, params)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
