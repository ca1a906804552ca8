"""Training-step benchmark: the reference AccRAFT recipe on one chip.

Reference recipe (configs/AccRAFT.yml, train_acc.py): batch 12 (6/GPU x 2
GPUs), 256^2 crops, 7 frames, frozen RAFT OFE (12 iters), AdamW+OneCycle,
noise aug. Here the whole step (preprocess -> 5-cell accumulation ->
loss -> grads -> AdamW update) is ONE jitted program; this script times it
with the K-vs-2K chained method and prints a JSON line.

    python scripts/bench_train.py [batch] [size]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 12
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 256
FRAMES = 7


def main():
    import jax
    import jax.numpy as jnp

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.train.engine import TrainState, make_acc_train_step
    from accflow_tpu.train.optim import make_optimizer

    est = build_flow_estimator(
        os.environ.get("BENCH_OFE", "raft"), compute_dtype="bfloat16",
        # BENCH_UNROLL: GRU-scan unroll under grad (default 1 — unlike
        # serving, the unrolled scan changes the saved-activation layout).
        scan_unroll=int(os.environ.get("BENCH_UNROLL", "1")),
        corr_lookup=os.environ.get("BENCH_LOOKUP", "fused"),
    )
    acfg = AccFlowConfig(
        compute_dtype="bfloat16",
        # BENCH_ACC_UNROLL: unroll the 5-cell accumulation scan (the
        # differentiated one; its boundary ops trace at ~26 ms/step).
        acc_unroll=int(os.environ.get("BENCH_ACC_UNROLL", "1")),
        # BENCH_ACC_REMAT: "" off, "full", or "dots" (cell remat policy).
        remat=os.environ.get("BENCH_ACC_REMAT", "") or False,
    )
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
        rng.uniform(-20, 20, (BATCH, SIZE, SIZE, (FRAMES - 2) * 2)).astype(np.float32)
    )
    key = jax.random.PRNGKey(7)

    def run_k(k, state):
        t0 = time.perf_counter()
        for i in range(k):
            state, loss, metrics = train_step(state, ofe_params, imgs, bflows,
                                              jax.random.fold_in(key, i))
        float(loss)  # sync
        return time.perf_counter() - t0, state

    # warm/compile
    _, state = run_k(1, state)
    k = 3
    t1, state = run_k(k, state)
    t2, state = run_k(2 * k, state)
    dt = max(t2 - t1, 1e-9) / k

    print(json.dumps({
        "metric": "acc_%s_train_step_b%d_%d"
        % (os.environ.get("BENCH_OFE", "raft"), BATCH, SIZE),
        "value": round(dt, 4),
        "unit": "s/step",
        "samples_per_sec": round(BATCH / dt, 2),
    }))


if __name__ == "__main__":
    main()
