"""CVO evaluation CLI (reference test_cvo.py flags, :106-112).

    python -m accflow_tpu.cli.test_cvo -d clean -acc direct -ofe raft \
        --ofe_ckpt checkpoints/raft-things.pth --dataset-root data/cvor

Extra flags beyond the reference: --dataset-root (CVOR data location),
--synthetic (generate a tiny synthetic dataset first — smoke/dev mode),
--size/--iters/--batch overrides.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", "-d", type=str, choices=["clean", "final"], default="clean")
    parser.add_argument("--acc", "-acc", type=str, choices=["acc", "direct"], default="direct")
    parser.add_argument("--acc_ckpt", type=str, default=None)
    parser.add_argument("--ofe", "-ofe", type=str, choices=["raft", "gma"], default="raft")
    parser.add_argument("--ofe_ckpt", type=str, default=None)
    parser.add_argument("--dataset-root", type=str, default="./data/cvor")
    parser.add_argument("--batch", type=int, default=10)
    parser.add_argument("--micro_batch", type=int, default=None,
                        help="per-compiled-call sub-batch (default: largest "
                        "divisor of batch <= 8 — batch 10 at 512^2 OOMs one "
                        "16 GB chip); metrics still aggregate per --batch")
    parser.add_argument("--end", type=int, default=6)
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--compute-dtype", type=str, default="bfloat16")
    parser.add_argument("--corr_lookup", type=str, default="fused",
                        help="correlation lookup implementation (see "
                        "RAFTConfig.corr_lookup; measured trade-offs in "
                        "PARITY.md)")
    parser.add_argument("--attn_chunk", type=int, default=0,
                        help="gma only: >0 recomputes attention per query "
                        "chunk instead of storing the (HW)^2 matrix "
                        "(hi-res memory mode; see GMAConfig.attn_chunk)")
    parser.add_argument("--scan_unroll", type=int, default=1,
                        help="GRU-iteration scan unroll factor (4 is the "
                        "serving-bench default: fewer loop-boundary ops "
                        "for more compile time)")
    parser.add_argument("--warm_start", action="store_true",
                        help="warm-start consecutive pair solves from the "
                        "previous advected flow (reference README TODO; "
                        "see ops/warmstart.py + AccFlowConfig.warm_start)")
    parser.add_argument("--synthetic", action="store_true",
                        help="generate a tiny synthetic CVOR dataset at "
                        "--dataset-root first (dev/smoke mode)")
    parser.add_argument("--size", type=int, default=64,
                        help="synthetic frame size")
    args = parser.parse_args(argv)

    if args.synthetic:
        import os.path as osp

        from accflow_tpu.data.synthetic import write_synthetic_cvor

        if not osp.exists(osp.join(args.dataset_root, "test", "meta.json")):
            write_synthetic_cvor(
                args.dataset_root, num_train=2, num_test=4,
                h=args.size, w=args.size,
            )

    from accflow_tpu.train.evaluate import evaluate_cvo

    model_name = args.acc + "|" + args.ofe
    evaluate_cvo(
        model_name,
        args.dataset_root,
        split=args.data,
        batch=args.batch,
        end=args.end,
        iters=args.iters,
        acc_ckpt=args.acc_ckpt,
        ofe_ckpt=args.ofe_ckpt,
        compute_dtype=args.compute_dtype,
        warm_start=args.warm_start,
        corr_lookup=args.corr_lookup,
        micro_batch=args.micro_batch,
        scan_unroll=args.scan_unroll,
        attn_chunk=args.attn_chunk,
    )


if __name__ == "__main__":
    main()
