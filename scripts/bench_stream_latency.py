"""Batch-1 streaming LATENCY (VERDICT r4 item 7): ms per frame,
end-to-end through the user-facing surface.

All streaming numbers so far are throughput at batch 2 (flows/s); a real
camera stream runs batch 1 and cares about wall ms/frame through
FlowPipeline.stream().send() — including [0,255]->[-1,1] normalization,
/8 padding, host->device transfer, the device step, and the output
device->host readback + unpad. This measures both:

  device   honest chained-iteration device step time (profiling.py
           semantics, like bench.py's stream mode) at batch 1
  e2e      wall time of FlowStream.send(frame) per frame, median and p90
           over N frames (includes everything a user's loop pays; note
           the axon tunnel adds a ~24 ms dispatch+readback round trip
           that on-host serving would not)

Env: BENCH_SIZE (512), BENCH_OFE (raft), LAT_ITERS ("6,4"), LAT_FRAMES
(40). Appends rows to BENCH_MATRIX.json.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZE = int(os.environ.get("BENCH_SIZE", "512"))
OFE = os.environ.get("BENCH_OFE", "raft")
FRAMES = int(os.environ.get("LAT_FRAMES", "40"))


def main():
    import jax

    from _matrix import record
    from accflow_tpu.api import FlowPipeline
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow

    est = build_flow_estimator(OFE, compute_dtype="bfloat16", scan_unroll=4)
    acfg = AccFlowConfig(compute_dtype="bfloat16", warm_start=True)
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)
    pipe = FlowPipeline(est, ofe_params, acc_params=acc_params, acfg=acfg)

    rng = np.random.default_rng(0)
    video = rng.integers(0, 256, (FRAMES, SIZE, SIZE, 3)).astype(np.uint8)

    import jax.numpy as jnp

    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.streaming import make_streaming_fns

    def device_ms(iters):
        """Honest b1 DEVICE step time (chained K-vs-2K inside one jitted
        fori_loop — bench.py measure_stream semantics at batch 1): what
        the hardware itself costs per frame, without the axon tunnel's
        per-dispatch round trip that on-host serving would not pay."""
        import jax

        est = build_flow_estimator(OFE, compute_dtype="bfloat16",
                                   iters=iters, scan_unroll=4)
        acfg = AccFlowConfig(compute_dtype="bfloat16", warm_start=True)
        op = est.init(jax.random.PRNGKey(0))
        ap = init_accflow(jax.random.PRNGKey(1), acfg)
        init_fn, step_fn = make_streaming_fns(est, acfg, op, ap)
        rng = np.random.default_rng(1)
        frames3 = jnp.asarray(
            rng.uniform(-1, 1, (3, 1, SIZE, SIZE, 3)).astype(np.float32))
        _, state0 = jax.jit(init_fn)(frames3)

        def make_loop(k):
            def loop(state, frame):
                def body(i, c):
                    acc, st, fr = c
                    out, st = step_fn(st, fr)
                    s = jnp.sum(out[0, 0, 0]).astype(jnp.float32)
                    return (acc + s, st, fr + s * 1e-30)
                acc, _, _ = jax.lax.fori_loop(
                    0, k, body, (jnp.float32(0.0), state, frame))
                return acc
            return jax.jit(loop)

        from accflow_tpu.utils.profiling import timed_pair_median

        k = 15
        f1, f2 = make_loop(k), make_loop(2 * k)
        args = (state0, frames3[2])
        float(f1(*args)); float(f2(*args))
        return timed_pair_median(f1, f2, args, k) * 1e3

    for iters in (int(x) for x in
                  os.environ.get("LAT_ITERS", "6,4").split(",")):
        dev = device_ms(iters)
        print(f"stream{iters} b1 {SIZE}^2 device step: {dev:.1f} ms/frame "
              f"({1e3/dev:.1f} frames/s)", flush=True)
        record(f"stream{iters}_b1_latency_ms", dev, "ms/frame", ofe=OFE,
               size=SIZE, frames=FRAMES, path="device")

        stream = pipe.stream(iters=iters)
        # Seed + compile (init + step programs) outside the timed region.
        for i in range(4):
            stream.send(video[i])
        ts = []
        for i in range(4, FRAMES):
            t0 = time.perf_counter()
            out = stream.send(video[i])
            ts.append(time.perf_counter() - t0)
        assert out.shape == (SIZE, SIZE, 2)
        ts_ms = np.sort(np.array(ts)) * 1e3
        med, p90 = float(np.median(ts_ms)), float(ts_ms[int(0.9 * len(ts_ms))])
        print(f"stream{iters} b1 {SIZE}^2 e2e send(): median {med:.1f} ms/frame "
              f"p90 {p90:.1f} ms ({1e3/med:.1f} frames/s) "
              f"[includes the axon-tunnel dispatch+readback round trip]",
              flush=True)
        record(f"stream{iters}_b1_latency_ms", med, "ms/frame", ofe=OFE,
               size=SIZE, p90_ms=round(p90, 1), frames=FRAMES, path="e2e")


if __name__ == "__main__":
    main()
