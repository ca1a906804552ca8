"""Minimized bisect of the 2048^2 compile failure (VERDICT r3 weak #2).

PARITY.md r3 recorded that BOTH memory modes fail to compile at 2048^2
through the remote-compile relay (tpu_compile_helper exit 1) and
attributed it to lookup-graph size. This probe isolates the failing
stage: each STAGE compiles+runs one piece of the 2048^2 ondemand
serving path in its own process (a compiler crash kills the process,
so the driver shell walks the stages in order and records the first
failure).

    for s in lookup raft1 raft12 raft12u1 pairs clip clipu1; do
        STAGE=$s timeout 1500 python scripts/probe_2048.py; done

Stages:
    lookup   the ondemand lookup op alone (65536 queries, chunk 1024)
    raft1    RAFT forward, 1 GRU iter, ondemand
    raft12   RAFT forward, 12 iters, scan_unroll=4 (the serving config)
    raft12u1 same with scan_unroll=1 (tests the graph-size theory)
    pairs    raft_pairs_forward, 2 pairs (the acc steady-state step)
    clip     the full acc clip (bench_hires 2048_ondemand_b1 config)
    clipu1   same with scan_unroll=1
Knobs: SIZE (default 2048), CHUNK (ondemand chunk, default 1024).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZE = int(os.environ.get("SIZE", "2048"))
CHUNK = int(os.environ.get("CHUNK", "1024"))
STAGE = os.environ.get("STAGE", "lookup")


def main():
    import jax
    import jax.numpy as jnp

    print(f"[probe_2048] stage={STAGE} size={SIZE} chunk={CHUNK} "
          f"backend={jax.default_backend()}", flush=True)
    t0 = time.time()
    rng = np.random.default_rng(0)
    h8 = SIZE // 8
    lookup_impl = f"ondemand:{CHUNK}"

    if STAGE == "lookup":
        from accflow_tpu.ops.corr import (
            build_corr_on_demand,
            lookup_corr_on_demand,
            prepare_ondemand_chunks,
        )

        f1 = jnp.asarray(rng.standard_normal((1, h8, h8, 256)), jnp.float32)
        f2 = jnp.asarray(rng.standard_normal((1, h8, h8, 256)), jnp.float32)
        coords = jnp.asarray(
            rng.uniform(0, h8, (1, h8, h8, 2)).astype(np.float32)
        )

        @jax.jit
        def f(f1, f2, coords):
            od = prepare_ondemand_chunks(
                build_corr_on_demand(f1, f2, 4), CHUNK
            )
            return lookup_corr_on_demand(od, coords, 4).sum()

        print("result", float(f(f1, f2, coords)), flush=True)
    elif STAGE in ("raft1", "raft12", "raft12u1", "pairs"):
        from accflow_tpu.models import build_flow_estimator

        iters = 1 if STAGE == "raft1" else 12
        unroll = 1 if STAGE in ("raft1", "raft12u1") else 4
        est = build_flow_estimator(
            "raft", compute_dtype="bfloat16", corr_lookup=lookup_impl,
            scan_unroll=unroll, iters=iters,
        )
        params = est.init(jax.random.PRNGKey(0))
        if STAGE == "pairs":
            frames = jnp.asarray(
                rng.uniform(-1, 1, (3, 1, SIZE, SIZE, 3)).astype(np.float32)
            )
            fn = jax.jit(
                lambda fr: est.pairs_fn(params)(fr, (2, 2), (1, 0)).sum()
            )
            print("result", float(fn(frames)), flush=True)
        else:
            i1 = jnp.asarray(rng.uniform(-1, 1, (1, SIZE, SIZE, 3)).astype(np.float32))
            i2 = jnp.asarray(rng.uniform(-1, 1, (1, SIZE, SIZE, 3)).astype(np.float32))
            fn = jax.jit(
                lambda a, b: est.forward(params, a, b, final_only=True)["flow_up"].sum()
            )
            print("result", float(fn(i1, i2)), flush=True)
    elif STAGE in ("clip", "clipu1"):
        from accflow_tpu.models import build_flow_estimator
        from accflow_tpu.models.accflow import (
            AccFlowConfig,
            accflow_forward,
            init_accflow,
        )

        est = build_flow_estimator(
            "raft", compute_dtype="bfloat16", corr_lookup=lookup_impl,
            scan_unroll=1 if STAGE == "clipu1" else 4,
        )
        acfg = AccFlowConfig(compute_dtype="bfloat16")
        ofe_params = est.init(jax.random.PRNGKey(0))
        acc_params = init_accflow(jax.random.PRNGKey(1), acfg)
        images = jnp.asarray(
            rng.uniform(-1, 1, (7, 1, SIZE, SIZE, 3)).astype(np.float32)
        )

        @jax.jit
        def fn(images):
            ofe_fn = lambda a, b: est.forward(
                ofe_params, a, b, final_only=True)["flow_up"]
            return accflow_forward(
                acc_params, ofe_fn, images, acfg,
                ofe_pairs=est.pairs_fn(ofe_params),
            )[-1].sum()

        print("result", float(fn(images)), flush=True)
    else:
        raise SystemExit(f"unknown STAGE {STAGE!r}")
    print(f"[probe_2048] stage={STAGE} OK in {time.time() - t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
