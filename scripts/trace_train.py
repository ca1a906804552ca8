"""Profile the accumulator TRAINING step on the TPU, per-op cost table.

Runs bench_train.py's step (frozen-OFE AccFlow training, reference
AccRAFT recipe shapes) under jax.profiler.trace and reuses
trace_serving.py's chrome-trace parser for per-op source attribution.

    BENCH_BATCH=12 BENCH_SIZE=256 python scripts/trace_train.py [trace_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import trace_serving  # noqa: E402  (sibling script: the parser)

TRACE_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/accflow_trace_train"
BATCH = int(os.environ.get("BENCH_BATCH", "12"))
SIZE = int(os.environ.get("BENCH_SIZE", "256"))
FRAMES = 7
REPS = int(os.environ.get("TRACE_REPS", "3"))


def run_traced():
    import jax
    import jax.numpy as jnp

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.train.engine import TrainState, make_acc_train_step
    from accflow_tpu.train.optim import make_optimizer

    est = build_flow_estimator(
        os.environ.get("BENCH_OFE", "raft"), compute_dtype="bfloat16"
    )
    acfg = AccFlowConfig(compute_dtype="bfloat16")
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)
    tx, _ = make_optimizer(lr=1.2e-4, num_steps=1000, wdecay=1e-5, clip=1.0)
    state = TrainState(acc_params, tx.init(acc_params), jnp.int32(0))
    train_step, _ = make_acc_train_step(est, acfg, tx, add_noise=True)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.uniform(0, 255, (BATCH, SIZE, SIZE, FRAMES * 3)).astype(np.float32)
    )
    bflows = jnp.asarray(
        rng.uniform(-20, 20, (BATCH, SIZE, SIZE, (FRAMES - 2) * 2)).astype(
            np.float32
        )
    )
    key = jax.random.PRNGKey(7)
    state, loss, _ = train_step(state, ofe_params, imgs, bflows, key)
    float(loss)  # compile outside the trace
    import jax.profiler

    with jax.profiler.trace(TRACE_DIR):
        for i in range(REPS):
            state, loss, _ = train_step(
                state, ofe_params, imgs, bflows, jax.random.fold_in(key, i)
            )
        float(loss)
    print("traced", flush=True)


if __name__ == "__main__":
    trace_serving.TRACE_DIR = TRACE_DIR
    trace_serving.REPS = REPS
    if not os.environ.get("PARSE_ONLY"):
        run_traced()
    trace_serving.parse()
