"""Fine-tune-step benchmark: the reference RAFT/GMA fine-tuning recipe.

Reference recipe (configs/RAFT.yml, fine_tune.py): batch 12, 256^2 crops,
12-iteration RAFT forward with the full 12-prediction gamma-weighted
sequence loss, train-mode BatchNorm, AdamW+OneCycle. This is the one
training path whose backward goes through the correlation lookup (the
accumulator trainer's OFE is frozen). One jitted step; K-vs-2K timing.

    python scripts/bench_finetune.py [batch] [size]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 12
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 256


def main():
    import jax
    import jax.numpy as jnp

    from accflow_tpu.models import build_flow_estimator
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
    tx, _ = make_optimizer(lr=1e-4, num_steps=1000, wdecay=1e-5, clip=1.0)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    train_step, _ = make_finetune_step(est, tx, add_noise=True, gamma=0.8)

    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(0, 255, (BATCH, SIZE, SIZE, 3)).astype(np.float32))
    label = jnp.asarray(rng.uniform(-20, 20, (BATCH, SIZE, SIZE, 2)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    def run_k(k, state):
        t0 = time.perf_counter()
        for i in range(k):
            state, loss, metrics = train_step(
                state, img1, img2, label, jax.random.fold_in(key, i)
            )
        float(loss)
        return time.perf_counter() - t0, state

    _, state = run_k(1, state)
    k = 3
    t1, state = run_k(k, state)
    t2, state = run_k(2 * k, state)
    dt = max(t2 - t1, 1e-9) / k

    print(json.dumps({
        "metric": "finetune_%s_train_step_b%d_%d"
        % (os.environ.get("BENCH_OFE", "raft"), BATCH, SIZE),
        "value": round(dt, 4),
        "unit": "s/step",
        "samples_per_sec": round(BATCH / dt, 2),
    }))


if __name__ == "__main__":
    main()
