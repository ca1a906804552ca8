"""Streaming-serving bench: occlusion-aware warm start vs cold start.

The warm-start path (AccFlowConfig.warm_start — the reference README's
own TODO, built in r2) advects the previous step's 1/8-res flows into the
next frame's grid and hands them to the estimator as flow_init, so the
GRU can converge in fewer iterations on video streams. This measures the
throughput side of that trade on the CVO-6 serving shape:

  cold12   fused batched OFE, 12 iters (the bench.py protocol)
  coldN    same with fewer iterations (quality NOT protocol-equivalent)
  warmN    stepwise warm-started OFE at N iterations

    python scripts/bench_stream.py
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

    def clip_time(iters, warm):
        est = build_flow_estimator("raft", compute_dtype="bfloat16", iters=iters)
        acfg = AccFlowConfig(compute_dtype="bfloat16", warm_start=warm)
        ofe_params = est.init(jax.random.PRNGKey(0))
        acc_params = init_accflow(jax.random.PRNGKey(1), acfg)

        def run(acc_params, ofe_params, images):
            return accflow_forward(
                acc_params, est.flow_fn(ofe_params), images, acfg,
                ofe_pairs=None if warm else est.pairs_fn(ofe_params),
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

        f1, f2 = make_loop(K), make_loop(2 * K)
        float(f1(acc_params, ofe_params, images))
        float(f2(acc_params, ofe_params, images))
        t0 = time.perf_counter()
        float(f1(acc_params, ofe_params, images))
        t1 = time.perf_counter()
        float(f2(acc_params, ofe_params, images))
        t2 = time.perf_counter()
        return max((t2 - t1) - (t1 - t0), 1e-9) / K / BATCH

    for name, iters, warm in (
        ("cold12", 12, False),
        ("cold6", 6, False),
        ("warm12", 12, True),
        ("warm6", 6, True),
        ("warm4", 4, True),
    ):
        t = clip_time(iters, warm)
        print(f"{name:8s} {t*1e3:8.1f} ms/clip  ({FRAMES/t:6.1f} frames/s)",
              flush=True)


if __name__ == "__main__":
    main()
