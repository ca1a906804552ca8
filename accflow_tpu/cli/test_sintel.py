"""High-Speed Sintel evaluation CLI (consumer for the reference's dead
High_Speed_Sintel loader, data/dataset.py:164-236).

    python -m accflow_tpu.cli.test_sintel -acc acc -ofe raft \
        --acc_ckpt checkpoints/acc_raft.pth --dataset-root data/hs_sintel

Per sample the subsampled high-FPS sequence spans the original Sintel
pair; EPE all/noc/occ are reported against the pair's GT flow.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--acc", "-acc", type=str, choices=["acc", "direct"], default="acc")
    parser.add_argument("--acc_ckpt", type=str, default=None)
    parser.add_argument("--ofe", "-ofe", type=str, choices=["raft", "gma"], default="raft")
    parser.add_argument("--ofe_ckpt", type=str, default=None)
    parser.add_argument("--dataset-root", type=str, default="./data/hs_sintel")
    parser.add_argument("--interv", type=int, default=6,
                        help="high-FPS frame subsampling stride")
    parser.add_argument("--iters", type=int, default=12)
    parser.add_argument("--compute-dtype", type=str, default="bfloat16")
    parser.add_argument("--result-file", type=str, default=None)
    parser.add_argument("--batch", type=int, default=4,
                        help="samples per compiled call (fixed resize -> "
                        "one jit shape)")
    args = parser.parse_args(argv)

    from accflow_tpu.train.evaluate import evaluate_sintel

    evaluate_sintel(
        args.acc + "|" + args.ofe,
        args.dataset_root,
        interv=args.interv,
        iters=args.iters,
        acc_ckpt=args.acc_ckpt,
        ofe_ckpt=args.ofe_ckpt,
        compute_dtype=args.compute_dtype,
        result_file=args.result_file,
        batch=args.batch,
    )


if __name__ == "__main__":
    main()
