"""High-resolution serving bench: stored-volume vs on-demand correlation.

The all-pairs correlation volume is O((HW/64)^2) floats per pair: ~85 MB
at 512^2 but ~22 GB at 2048^2 — past ~1500^2 one 16 GB v5e cannot hold a
single pair's volume, and the reference's answer (`alternate_corr`,
networks/raft/raft.py:45-46) was never shipped. `corr_lookup=ondemand`
(ops/corr.py::lookup_corr_on_demand) recomputes correlation rows per
query chunk on the MXU instead, so memory stays O(HW*C + chunk*HW).

Runs the AccFlow+RAFT serving step (bench.py protocol: 7-frame clips,
12 OFE iters, bf16 compute) across (size, batch, lookup) configs in one
process; a config whose volume does not fit prints OOM instead of a
number. Filter with HIRES=name,name; K iterations via HIRES_K (default 2
— hi-res clips are seconds each).

    python scripts/bench_hires.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FRAMES = 7
K = int(os.environ.get("HIRES_K", "2"))


def main():
    import jax
    import jax.numpy as jnp

    # Numbers below are meaningless on the CPU fallback the axon plugin
    # degrades to when the relay is down — refuse to "measure" there.
    backend = jax.default_backend()
    if backend not in ("tpu", "axon") and not os.environ.get("HIRES_ALLOW_CPU"):
        raise SystemExit(f"refusing to bench on backend {backend!r} "
                         "(relay down?); set HIRES_ALLOW_CPU=1 to override")

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, accflow_forward, init_accflow

    acfg = AccFlowConfig(compute_dtype="bfloat16")

    def clip_time(size, batch, lookup, ofe="raft", fused_ofe=True,
                  warm=False, iters=None, **est_kw):
        # fused_ofe=False: the STEPWISE accumulation (max 3-pair OFE
        # batches) — at very high res the fused path's 11-pair batch is
        # itself the memory wall (see the 2048^2 rows). warm=True: the
        # warm-start recurrence (2-pair steps + advected flow_init).
        if iters is not None:
            est_kw["iters"] = iters
        est = build_flow_estimator(
            ofe, compute_dtype="bfloat16", corr_lookup=lookup,
            scan_unroll=4 if ofe == "raft" else 1, **est_kw
        )
        acfg_c = AccFlowConfig(compute_dtype="bfloat16", fused_ofe=fused_ofe,
                               warm_start=warm)
        ofe_params = est.init(jax.random.PRNGKey(0))
        acc_params = init_accflow(jax.random.PRNGKey(1), acfg_c)
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.uniform(-1.0, 1.0, (FRAMES, batch, size, size, 3)).astype(np.float32)
        )

        def run(acc_params, ofe_params, images):
            if warm:
                return accflow_forward(
                    acc_params, est.flow_fn(ofe_params), images, acfg_c
                )
            ofe_fn = lambda a, b: est.forward(ofe_params, a, b, final_only=True)["flow_up"]
            return accflow_forward(
                acc_params, ofe_fn, images, acfg_c,
                ofe_pairs=est.pairs_fn(ofe_params) if fused_ofe else None,
            )

        def make_loop(k):
            def loop(acc_params, ofe_params, images):
                def body(i, carry):
                    checksum, images = carry
                    outs = run(acc_params, ofe_params, images)
                    s = jnp.sum(outs[-1][0, 0, 0]).astype(jnp.float32)
                    images = images + s * 1e-30
                    return (checksum + s, images)

                checksum, _ = jax.lax.fori_loop(0, k, body, (jnp.float32(0.0), images))
                return checksum

            return jax.jit(loop)

        from accflow_tpu.utils.profiling import timed_pair_median

        try:
            f1, f2 = make_loop(K), make_loop(2 * K)
            float(f1(acc_params, ofe_params, images))
            float(f2(acc_params, ofe_params, images))
            return timed_pair_median(
                f1, f2, (acc_params, ofe_params, images), K
            ) / batch
        except Exception as e:
            if "tpu_compile_helper" not in str(e):
                raise
            # The fori_loop K-chaining wrapper ~doubles the program and
            # at 2048^2 pushes some configs over the remote-compile
            # helper's limit, while the DIRECT clip program compiles and
            # runs (scripts/probe_2048.py bisect). Fall back to direct
            # per-call timing with a scalar readback — at multi-second
            # hi-res clip times the ~24 ms dispatch+readback overhead is
            # <3%, so this is honest at this scale (and only used there).
            print(f"  [direct-timing fallback: chained loop hit the "
                  f"compile-helper limit]", flush=True)
            g = jax.jit(
                lambda a, o, im: run(a, o, im)[-1].sum().astype(jnp.float32)
            )
            float(g(acc_params, ofe_params, images))  # compile + warm
            ts = []
            for _ in range(max(K, 2)):
                t0 = time.perf_counter()
                float(g(acc_params, ofe_params, images))
                ts.append(time.perf_counter() - t0)
            return min(ts) / batch

    configs = [
        ("512_fused_b2", 512, 2, "fused", {}),
        ("512_ondemand_b2", 512, 2, "ondemand", {}),
        ("1024_fused_b1", 1024, 1, "fused", {}),
        ("1024_ondemand_b1", 1024, 1, "ondemand", {}),
        # 1536^2: the stored volume (~7.2 GB f32 per pair before lane
        # padding) is uncompilable — the first acc step batches THREE
        # pairs (accflow.py:17), i.e. >21 GB of volumes on a 16 GB chip;
        # the on-demand row locates the streaming mode's practical
        # ceiling here.
        ("1536_fused_b1", 1536, 1, "fused", {}),
        ("1536_ondemand_b1", 1536, 1, "ondemand", {}),
        ("2048_fused_b1", 2048, 1, "fused", {}),
        ("2048_ondemand_b1", 2048, 1, "ondemand", {}),
        # r4 bisect (scripts/probe_2048.py): every <=2-pair ondemand
        # stage compiles and RUNS at 2048^2 — the r3 failure is the
        # fused path's 11-pair OFE batch, not the lookup graph. The
        # stepwise (<=3-pair) and warm-start (2-pair) recurrences are
        # the 2048^2-capable configurations:
        ("2048_od_stepwise_b1", 2048, 1, "ondemand",
         {"fused_ofe": False}),
        ("2048_od_warm6_b1", 2048, 1, "ondemand",
         {"warm": True, "iters": 6}),
        # GMA needs BOTH memory modes at hi-res: volume-free corr AND
        # chunked attention (the dense (HW,HW) matrix is 1 GB bf16 at
        # 1024^2 with a 4 GB f32 softmax temporary).
        ("1024_gma_dense_b1", 1024, 1, "fused", {"ofe": "gma"}),
        ("1024_gma_od_b1", 1024, 1, "ondemand",
         {"ofe": "gma", "attn_chunk": 1024}),
    ]
    sel = os.environ.get("HIRES", "")
    if sel:
        names = sel.split(",")
        configs = [c for c in configs if c[0] in names]

    from _matrix import record

    for name, size, batch, lookup, kw in configs:
        try:
            t = clip_time(size, batch, lookup, **kw)
            print(
                f"{name:18s} {t*1e3:9.1f} ms/clip  ({FRAMES/t:6.2f} frames/s)",
                flush=True,
            )
            record(f"hires_{name}_frames_per_sec", FRAMES / t,
                   "frames/s/chip", size=size, batch=batch, lookup=lookup)
        except Exception as e:  # RESOURCE_EXHAUSTED etc. — keep sweeping
            msg = str(e).splitlines()[0][:120]
            kind = "OOM" if "RESOURCE_EXHAUSTED" in str(e) or "emory" in str(e) else "FAIL"
            print(f"{name:18s} {kind}: {msg}", flush=True)


if __name__ == "__main__":
    main()
