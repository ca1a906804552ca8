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

    for iters in (int(x) for x in
                  os.environ.get("LAT_ITERS", "6,4").split(",")):
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
              f"p90 {p90:.1f} ms ({1e3/med:.1f} frames/s)", flush=True)
        record(f"stream{iters}_b1_latency_ms", med, "ms/frame", ofe=OFE,
               size=SIZE, p90_ms=round(p90, 1), frames=FRAMES, path="e2e")


if __name__ == "__main__":
    main()
