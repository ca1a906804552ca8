"""Streaming-serving bench: occlusion-aware warm start vs cold start.

The warm-start path (AccFlowConfig.warm_start — the reference README's
own TODO, built in r2) advects the previous step's 1/8-res flows into the
next frame's grid and hands them to the estimator as flow_init, so the
GRU can converge in fewer iterations on video streams. This measures BOTH
sides of that trade on the CVO-6 serving shape:

  cold12   fused batched OFE, 12 iters (the bench.py protocol)
  coldN    same with fewer iterations (quality NOT protocol-equivalent)
  warmN    stepwise warm-started OFE at N iterations

    python scripts/bench_stream.py              # throughput table
    QUALITY=1 python scripts/bench_stream.py    # + EPE-vs-cold evidence

The quality section makes the README's "quality parity at reduced iters"
claim carry its own evidence: it writes a synthetic CVOR set (exact
constant-velocity GT, data/synthetic.py), fine-tunes RAFT on it and
briefly trains the accumulator (so EPE reflects a converging model, not
random init), then runs the CVO protocol (evaluate_cvo) for every
(iters, warm) config with the SAME weights — only the iteration schedule
differs — and prints EPE all + delta vs cold12.

A `streamN` row measures the PRODUCTIZED stateful streaming surface
(accflow_tpu/streaming.py — FlowPipeline.stream() / export --streaming):
steady-state per-frame steps with the state resident on device, i.e. the
serving configuration bench.py reports as stream_frames_per_sec.

Env knobs: BENCH_BATCH, BENCH_SIZE, BENCH_OFE (raft|gma), QUALITY,
QUALITY_STEPS (default 300), QUALITY_SIZE (default 256), QUALITY_CLIPS
(default 10).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "2"))
SIZE = int(os.environ.get("BENCH_SIZE", "512"))
OFE = os.environ.get("BENCH_OFE", "raft")
FRAMES = 7
K = 4

CONFIGS = (
    ("cold12", 12, False),
    ("cold6", 6, False),
    ("warm12", 12, True),
    ("warm6", 6, True),
    ("warm4", 4, True),
)


def quality_table(root, ofe_params, acc_params, configs=CONFIGS, batch=2,
                  compute_dtype="bfloat16", result_file=None):
    """CVO-protocol EPE (evaluate_cvo, acc|raft path) for each
    (name, iters, warm_start) config with shared weights. Returns
    [{name, iters, warm, epe_all, epe_occ, epe_vis}, ...]."""
    from accflow_tpu.train.evaluate import evaluate_cvo

    rows = []
    for name, iters, warm in configs:
        r = evaluate_cvo(
            f"acc|{OFE}", root, batch=batch, iters=iters,
            params=ofe_params, acc_params=acc_params,
            warm_start=warm, compute_dtype=compute_dtype,
            result_file=result_file or os.devnull,
        )
        rows.append({
            "name": name, "iters": iters, "warm": warm,
            "epe_all": r["all"], "epe_occ": r["occ"], "epe_vis": r["vis"],
        })
    return rows


def run_quality():
    """Train-on-synthetic + EPE table (see module docstring)."""
    import tempfile

    from _synth_train import train_synthetic_weights

    steps = int(os.environ.get("QUALITY_STEPS", "300"))
    qsize = int(os.environ.get("QUALITY_SIZE", "256"))
    clips = int(os.environ.get("QUALITY_CLIPS", "10"))

    # QUALITY_REUSE=<tmpdir of a previous run> skips data synthesis and
    # resumes the fine-tune from its checkpoints (the remote-compile relay
    # occasionally drops long runs; this makes the experiment restartable).
    reuse = os.environ.get("QUALITY_REUSE")
    tmp = reuse or tempfile.mkdtemp(prefix="stream_quality_")
    root, ofe_params, acc_params = train_synthetic_weights(
        tmp, steps=steps, qsize=qsize, clips=clips, ofe=OFE,
        reuse=bool(reuse),
    )

    rows = quality_table(root, ofe_params, acc_params, batch=min(2, clips))
    base = rows[0]["epe_all"]
    print(f"\n{'config':8s} {'iters':>5s} {'EPE all':>8s} {'d vs cold12':>11s} "
          f"{'EPE occ':>8s} {'EPE vis':>8s}")
    for r in rows:
        print(f"{r['name']:8s} {r['iters']:5d} {r['epe_all']:8.3f} "
              f"{r['epe_all'] - base:+11.3f} {r['epe_occ']:8.3f} "
              f"{r['epe_vis']:8.3f}", flush=True)
    return rows


def main():
    if os.environ.get("QUALITY", "0") == "1" and os.environ.get("QUALITY_ONLY"):
        run_quality()
        return

    import jax
    import jax.numpy as jnp

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, accflow_forward, init_accflow

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.uniform(-1.0, 1.0, (FRAMES, BATCH, SIZE, SIZE, 3)).astype(np.float32)
    )

    def stream_time(iters):
        """Steady-state per-frame step time of the productized streaming
        surface (accflow_tpu.streaming) — mirrors bench.py measure_stream."""
        from accflow_tpu.streaming import make_streaming_fns

        est = build_flow_estimator(OFE, compute_dtype="bfloat16", iters=iters,
                                   scan_unroll=4,
                                   corr_lookup=os.environ.get("BENCH_LOOKUP", "fused"),
                                   attn_chunk=int(os.environ.get("BENCH_ATTN_CHUNK", "0")))
        acfg = AccFlowConfig(compute_dtype="bfloat16", warm_start=True)
        ofe_params = est.init(jax.random.PRNGKey(0))
        acc_params = init_accflow(jax.random.PRNGKey(1), acfg)
        init_fn, step_fn = make_streaming_fns(est, acfg, ofe_params, acc_params)
        _, state0 = jax.jit(init_fn)(images[:3])
        frame0 = images[2]

        def make_loop(k):
            def loop(state, frame):
                def body(i, carry):
                    checksum, state, frame = carry
                    out, state = step_fn(state, frame)
                    s = jnp.sum(out[0, 0, 0]).astype(jnp.float32)
                    frame = frame + s * 1e-30
                    return (checksum + s, state, frame)

                checksum, _, _ = jax.lax.fori_loop(
                    0, k, body, (jnp.float32(0.0), state, frame))
                return checksum

            return jax.jit(loop)

        from accflow_tpu.utils.profiling import timed_pair_median

        k = 4 * K
        f1, f2 = make_loop(k), make_loop(2 * k)
        float(f1(state0, frame0))
        float(f2(state0, frame0))
        return timed_pair_median(f1, f2, (state0, frame0), k) / BATCH

    def clip_time(iters, warm):
        est = build_flow_estimator(OFE, compute_dtype="bfloat16", iters=iters,
                                   corr_lookup=os.environ.get("BENCH_LOOKUP", "fused"),
                                   attn_chunk=int(os.environ.get("BENCH_ATTN_CHUNK", "0")))
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

        from accflow_tpu.utils.profiling import timed_pair_median

        f1, f2 = make_loop(K), make_loop(2 * K)
        float(f1(acc_params, ofe_params, images))
        float(f2(acc_params, ofe_params, images))
        return timed_pair_median(
            f1, f2, (acc_params, ofe_params, images), K
        ) / BATCH

    # BENCH_CONFIGS: comma list of row names (cold12, warm6, stream4, ...)
    # to (re)run — the relay sometimes drops long multi-config processes.
    only = os.environ.get("BENCH_CONFIGS")
    only = set(only.split(",")) if only else None

    from _matrix import record

    for name, iters, warm in CONFIGS:
        if only is not None and name not in only:
            continue
        t = clip_time(iters, warm)
        print(f"{name:8s} {t*1e3:8.1f} ms/clip  ({FRAMES/t:6.1f} frames/s)",
              flush=True)
        record(f"stream_{name}_frames_per_sec", FRAMES / t, "frames/s/chip",
               ofe=OFE, batch=BATCH, size=SIZE,
               lookup=os.environ.get("BENCH_LOOKUP", "fused"))

    for iters in (6, 4):
        if only is not None and f"stream{iters}" not in only:
            continue
        t = stream_time(iters)
        print(f"stream{iters} {t*1e3:8.1f} ms/frame ({1.0/t:6.1f} frames/s)"
              " steady-state", flush=True)
        record(f"stream_stream{iters}_frames_per_sec", 1.0 / t,
               "flows/s/chip", ofe=OFE, batch=BATCH, size=SIZE,
               lookup=os.environ.get("BENCH_LOOKUP", "fused"))

    if os.environ.get("QUALITY", "0") == "1":
        run_quality()


if __name__ == "__main__":
    main()
