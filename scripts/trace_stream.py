"""Profile the steady-state streaming step on the TPU (per-op table).

Traces ONE push() of the productized streaming surface
(accflow_tpu/streaming.py::make_streaming_fns step_fn — the path
bench.py reports as stream_frames_per_sec) and prints the same
per-(op, deepest-source) cost table as trace_serving.py. This is the
adjudication ground truth for the repo's best shipped raw number.

    BENCH_STREAM_ITERS=4 python scripts/trace_stream.py [trace_dir]

Env knobs: BENCH_BATCH (2), BENCH_SIZE (512), BENCH_OFE (raft|gma),
BENCH_STREAM_ITERS (4), BENCH_LOOKUP (fused), BENCH_UNROLL (4),
TRACE_REPS (4), TRACE_DETAIL (source substring -> per-HLO rows).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import trace_serving  # noqa: E402  (sibling script: shared chrome-trace parser)

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/accflow_trace_stream"
BATCH = int(os.environ.get("BENCH_BATCH", "2"))
SIZE = int(os.environ.get("BENCH_SIZE", "512"))
ITERS = int(os.environ.get("BENCH_STREAM_ITERS", "4"))
REPS = int(os.environ.get("TRACE_REPS", "4"))

trace_serving.TRACE_DIR = TRACE_DIR
trace_serving.REPS = REPS


def run_traced():
    import jax
    import jax.numpy as jnp

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.streaming import make_streaming_fns

    est = build_flow_estimator(
        os.environ.get("BENCH_OFE", "raft"),
        compute_dtype="bfloat16",
        iters=ITERS,
        corr_lookup=os.environ.get("BENCH_LOOKUP", "fused"),
        scan_unroll=int(os.environ.get("BENCH_UNROLL", "4")),
        attn_chunk=int(os.environ.get("BENCH_ATTN_CHUNK", "0")),
    )
    acfg = AccFlowConfig(compute_dtype="bfloat16", warm_start=True)
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)
    init_fn, step_fn = make_streaming_fns(est, acfg, ofe_params, acc_params)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(-1, 1, (4, BATCH, SIZE, SIZE, 3)).astype(np.float32)
    )
    _, state = jax.jit(init_fn)(frames[:3])
    step = jax.jit(step_fn)

    out, state1 = step(state, frames[3])  # compile outside the trace
    float(out[0, 0, 0, 0])
    with jax.profiler.trace(TRACE_DIR):
        s = state
        for _ in range(REPS):
            out, s = step(s, frames[3])
        float(out[0, 0, 0, 0])
    print("traced", flush=True)


if __name__ == "__main__":
    if os.environ.get("PARSE_ONLY"):
        trace_serving.parse()
    else:
        run_traced()
        trace_serving.parse()
