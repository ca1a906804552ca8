"""End-to-end ablation bench: isolate per-iteration vs fixed costs.

Runs the AccFlow+RAFT serving step (as bench.py, batch 2, 512^2) under
config variants in ONE process and prints clip-rate per variant:

- base:      mm lookup, f32 corr volume, 12 OFE iters
- vol_bf16:  bfloat16 corr volume storage
- iters6/3:  fewer GRU iterations -> linear fit gives ms/iteration
             (lookup + update block) vs fixed (encoders + corr build +
             accumulation cells + upsampling)

    python scripts/bench_ablate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "2"))
SIZE = int(os.environ.get("BENCH_SIZE", "512"))
FRAMES = 7
K = 4


def main():
    import jax
    import jax.numpy as jnp

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, accflow_forward, init_accflow

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(-1.0, 1.0, (FRAMES, BATCH, SIZE, SIZE, 3)).astype(np.float32)
    )

    def clip_time(est, acfg):
        ofe_params = est.init(jax.random.PRNGKey(0))
        acc_params = init_accflow(jax.random.PRNGKey(1), acfg)

        def run(acc_params, ofe_params, images):
            ofe_fn = lambda a, b: est.forward(ofe_params, a, b, final_only=True)["flow_up"]
            return accflow_forward(
                acc_params, ofe_fn, images, acfg, ofe_pairs=est.pairs_fn(ofe_params)
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

        f1, f2 = make_loop(K), make_loop(2 * K)
        float(f1(acc_params, ofe_params, images))
        float(f2(acc_params, ofe_params, images))
        return timed_pair_median(
            f1, f2, (acc_params, ofe_params, images), K
        ) / BATCH

    acfg = AccFlowConfig(compute_dtype="bfloat16")
    import os as _os
    variants = [
        ("base_12it_f32vol", dict()),
        ("fused_bd", dict(corr_lookup="fused_bd")),
        ("fused_bd2", dict(corr_lookup="fused_bd2")),
        ("fused_vy", dict(corr_lookup="fused_vy")),
        ("fused_cat", dict(corr_lookup="fused_cat")),
        ("fused_vy_cat", dict(corr_lookup="fused_vy_cat")),
        ("vy_cat_bf16vol", dict(corr_lookup="fused_vy_cat",
                                corr_volume_dtype="bfloat16")),
        ("lookup_pallas", dict(corr_lookup="pallas")),
        # r3: bf16 volume under the flat-Q layout (the r1 negative result
        # predates it; the r2 trace shows a 10.4 ms/step in-scan cast of
        # the f32 volume that bf16 storage hoists to build time).
        ("fused_bf16vol", dict(corr_volume_dtype="bfloat16")),
        ("mm_bf16vol", dict(corr_lookup="mm", corr_volume_dtype="bfloat16")),
        ("pallas_fused", dict(corr_lookup="pallas_fused")),
        ("pf_bf16vol", dict(corr_lookup="pallas_fused",
                            corr_volume_dtype="bfloat16")),
        # r3: per-level mixes (micro_lookup2 at B=22: vpu_y wins L1/L2
        # standalone, mm wins L0/L3 — but the r2 all-vpu_y END-TO-END loss
        # says in-model fusion can invert micro wins; race the mixes).
        ("mix_mvvm", dict(corr_lookup="fused_mix:mm,vpu_y,vpu_y,mm")),
        ("mix_mvvv", dict(corr_lookup="fused_mix:mm,vpu_y,vpu_y,vpu_y")),
        ("mix_mmvm", dict(corr_lookup="fused_mix:mm,mm,vpu_y,mm")),
        ("mix_mmmr", dict(corr_lookup="fused_mix:mm,mm,mm,rows")),
        # r3: pack only the tiny levels (their mm einsums trigger a 31 GB/s
        # XLA convolution lowering — traced; one taller packed einsum may
        # dodge it while keeping mm for the well-lowered big levels).
        ("packed2", dict(corr_lookup="packed2")),
        ("iters3", dict(iters=3)),
        ("iters3_pallas", dict(iters=3, corr_lookup="pallas")),
        # r3: unroll the GRU scan — the serving trace pins ~7 ms/step on
        # while-loop boundary slice/copy ops (raft.py scan line).
        ("unroll4", dict(scan_unroll=4)),
        ("unroll12", dict(scan_unroll=12)),
        # r3: space-to-depth stem (12-channel MXU contraction instead of 3).
        ("stem_s2d", dict(stem_s2d=True)),
        ("s2d_unroll4", dict(stem_s2d=True, scan_unroll=4)),
        # r5: ondemand chunk sweep (VERDICT item 3 — the volume-free path
        # measured +57% over stored with no trace explaining it; sweep the
        # lax.map chunk grain against the shipped fused+unroll4 config).
        # At 512^2 Q=4096: chunk 4096 = single chunk (no lax.map, full
        # rows live — the serialization-free bound), 512 = 8 chunks.
        ("od_auto_unroll4", dict(corr_lookup="ondemand", scan_unroll=4)),
        ("od512_unroll4", dict(corr_lookup="ondemand:512", scan_unroll=4)),
        ("od1024_unroll4", dict(corr_lookup="ondemand:1024", scan_unroll=4)),
        ("od2048_unroll4", dict(corr_lookup="ondemand:2048", scan_unroll=4)),
        ("od4096_unroll4", dict(corr_lookup="ondemand:4096", scan_unroll=4)),
        ("fused_unroll4", dict(corr_lookup="fused", scan_unroll=4)),
    ]
    # stem_s2d also applies to the AccFlow context encoder.
    acc_cfgs = {
        "stem_s2d": AccFlowConfig(compute_dtype="bfloat16", stem_s2d=True),
        "s2d_unroll4": AccFlowConfig(compute_dtype="bfloat16", stem_s2d=True),
    }
    sel = _os.environ.get("ABLATE", "")
    if sel:
        names = sel.split(",")
        variants = [v for v in variants if v[0] in names]
    from _matrix import record

    times = {}
    for name, kw in variants:
        est = build_flow_estimator("raft", compute_dtype="bfloat16", **kw)
        t = clip_time(est, acc_cfgs.get(name, acfg))
        times[name] = t
        print(f"{name:22s} {t*1e3:8.1f} ms/clip  ({FRAMES/t:6.1f} frames/s)", flush=True)
        record(f"ablate_{name}_frames_per_sec", FRAMES / t, "frames/s/chip",
               batch=BATCH, size=SIZE)

    for suffix in ("", "_pallas"):
        full = "base_12it_f32vol" if not suffix else "lookup_pallas"
        it3 = "iters3" + suffix
        if full in times and it3 in times:
            per_iter = (times[full] - times[it3]) / 9.0
            fixed = times[full] - 12 * per_iter
            print(f"[{full}] per-iter: {per_iter*1e3:.2f} ms/clip/iter; "
                  f"fixed: {fixed*1e3:.1f} ms/clip")


if __name__ == "__main__":
    main()
