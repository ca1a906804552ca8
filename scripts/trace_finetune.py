"""Profile the estimator FINE-TUNE step on the TPU, per-op cost table
(VERDICT r3 weak #5: the one benchmarked path with no trace adjudication
— the backward through the corr lookup + train-mode BN).

Runs bench_finetune.py's step (make_finetune_step: 12-iter forward with
the full prediction sequence, gamma-weighted sequence loss, backward
through the lookup, batch-stat BN with EMA updates, AdamW) under
jax.profiler.trace and reuses trace_serving.py's chrome-trace parser.

    BENCH_BATCH=12 BENCH_SIZE=256 python scripts/trace_finetune.py [dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import trace_serving  # noqa: E402  (sibling script: the parser)

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/accflow_trace_ft"
BATCH = int(os.environ.get("BENCH_BATCH", "12"))
SIZE = int(os.environ.get("BENCH_SIZE", "256"))
REPS = int(os.environ.get("TRACE_REPS", "3"))


def run_traced():
    import jax
    import jax.numpy as jnp

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.nn.layers import bn_buffer_mask
    from accflow_tpu.train.engine import TrainState
    from accflow_tpu.train.finetune import make_finetune_step
    from accflow_tpu.train.optim import make_optimizer

    est = build_flow_estimator(
        os.environ.get("BENCH_OFE", "raft"), compute_dtype="bfloat16",
        scan_unroll=int(os.environ.get("BENCH_UNROLL", "1")),
        scan_remat=os.environ.get("BENCH_REMAT", "dots"),
        corr_lookup=os.environ.get("BENCH_LOOKUP", "fused"),
    )
    params = est.init(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(lr=1.2e-4, num_steps=1000, wdecay=1e-5, clip=1.0,
                           buffer_mask=bn_buffer_mask(params))
    state = TrainState(params, tx.init(params), jnp.int32(0))
    train_step, _ = make_finetune_step(est, tx, add_noise=True, gamma=0.85)

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(
        rng.uniform(0, 255, (BATCH, SIZE, SIZE, 3)).astype(np.float32)
    )
    img2 = jnp.asarray(
        rng.uniform(0, 255, (BATCH, SIZE, SIZE, 3)).astype(np.float32)
    )
    label = jnp.asarray(
        rng.uniform(-20, 20, (BATCH, SIZE, SIZE, 2)).astype(np.float32)
    )
    key = jax.random.PRNGKey(7)
    state, loss, _ = train_step(state, img1, img2, label, key)
    float(loss)  # compile outside the trace
    import jax.profiler

    with jax.profiler.trace(TRACE_DIR):
        for i in range(REPS):
            state, loss, _ = train_step(
                state, img1, img2, label, jax.random.fold_in(key, i)
            )
        float(loss)
    print("traced", flush=True)


if __name__ == "__main__":
    trace_serving.TRACE_DIR = TRACE_DIR
    trace_serving.REPS = REPS
    if not os.environ.get("PARSE_ONLY"):
        run_traced()
    trace_serving.parse()
