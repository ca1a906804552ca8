"""Export the AccFlow serving pipeline as a portable StableHLO artifact.

    python -m accflow_tpu.cli.export_serving --ofe raft \
        --acc_ckpt checkpoints/acc+raft-things.pth \
        --frames 7 --batch 2 --size 512 --out acc_raft_512.sflow

The artifact bakes the converted weights in as constants and is loadable
with jax alone (accflow_tpu.serving.load_artifact / jax.export) on any
machine with the target platform. Without --acc_ckpt it exports a
random-init model (smoke/testing).

--streaming exports the STATEFUL warm-start streaming pipeline instead
(accflow_tpu.streaming): one artifact holding (init, step) StableHLO
functions with an explicit carry, consumed frame-by-frame via
FlowPipeline.from_streaming_artifact(path).send(frame). --frames/--batch
polymorphism do not apply there (the state is per-frame); --iters
defaults to the warm-start serving count (6) when --streaming is set.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ofe", choices=["raft", "gma"], default="raft")
    parser.add_argument("--acc_ckpt", type=str, default=None,
                        help="acc+{ofe}-*.pth checkpoint (OFE included)")
    parser.add_argument("--frames", type=int, default=7)
    parser.add_argument("--batch", type=int, default=2,
                        help="0 exports a batch-polymorphic artifact "
                        "(symbolic batch dim — serves any batch >= 1)")
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--iters", type=int, default=None,
                        help="OFE iterations (default 12; 6 with --streaming)")
    parser.add_argument("--streaming", action="store_true",
                        help="export the stateful warm-start streaming "
                        "pipeline (init+step with explicit carry) instead "
                        "of the fixed-clip function")
    parser.add_argument("--compute-dtype", type=str, default="bfloat16")
    parser.add_argument("--corr_lookup", type=str, default="fused",
                        help="correlation impl; 'ondemand[:chunk]' bakes "
                        "the volume-free hi-res mode into the artifact")
    parser.add_argument("--attn_chunk", type=int, default=0,
                        help="gma only: chunked on-demand attention "
                        "(see GMAConfig.attn_chunk)")
    parser.add_argument("--scan_unroll", type=int, default=4,
                        help="GRU scan unroll baked into the artifact")
    parser.add_argument("--weights_dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="storage dtype of the baked-in weights; "
                        "bfloat16 halves the artifact and is numerically "
                        "free on the bfloat16 compute path")
    parser.add_argument("--platforms", type=str, default=None,
                        help="comma list, e.g. 'tpu' or 'tpu,cpu' "
                        "(default: current backend)")
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args(argv)

    import jax

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.serving import export_serving, save_artifact

    iters = args.iters if args.iters is not None else (6 if args.streaming else 12)
    est = build_flow_estimator(
        args.ofe, compute_dtype=args.compute_dtype, iters=iters,
        corr_lookup=args.corr_lookup, scan_unroll=args.scan_unroll,
        attn_chunk=args.attn_chunk,
    )
    acfg = AccFlowConfig(compute_dtype=args.compute_dtype)
    if args.acc_ckpt:
        from accflow_tpu.convert.torch_weights import load_accflow_checkpoint

        acc_params, ofe_params = load_accflow_checkpoint(
            args.acc_ckpt,
            init_accflow(jax.random.PRNGKey(1), acfg),
            est.init(jax.random.PRNGKey(0)),
        )
    else:
        ofe_params = est.init(jax.random.PRNGKey(0))
        acc_params = init_accflow(jax.random.PRNGKey(1), acfg)

    platforms = args.platforms.split(",") if args.platforms else None
    if args.streaming:
        from accflow_tpu.streaming import export_streaming, save_streaming_artifact

        if not args.batch:
            parser.error("--streaming needs a concrete --batch (state is "
                         "shape-specialized); got --batch 0")
        init_exp, step_exp = export_streaming(
            est, acfg, ofe_params, acc_params,
            (args.batch, args.size, args.size),
            platforms=platforms, weights_dtype=args.weights_dtype,
        )
        save_streaming_artifact(args.out, init_exp, step_exp)
        import os

        print(f"exported streaming {args.out} "
              f"({os.path.getsize(args.out) / 1e6:.1f} MB, "
              f"platforms {init_exp.platforms}, iters {iters})")
        return
    exported = export_serving(
        est, acfg, ofe_params, acc_params,
        (args.frames, args.batch or None, args.size, args.size, 3),
        platforms=platforms, weights_dtype=args.weights_dtype,
    )
    save_artifact(exported, args.out)
    import os

    print(f"exported {args.out} ({os.path.getsize(args.out) / 1e6:.1f} MB, "
          f"platforms {exported.platforms})")


if __name__ == "__main__":
    main()
