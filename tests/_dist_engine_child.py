"""Child process for the 2-process ENGINE soak
(tests/test_sharding.py::test_two_process_train_acc_engine).

Runs the REAL train_acc engine (not a hand-rolled step) for 2 steps with
validation + checkpointing under jax.distributed: 2 processes x 2 local
CPU devices = a 4-device global mesh. Exercises everything the reference
single-process engine does — dir archiving, logging, validation EPE
aggregation (host_array allgather of sharded per-sample metrics), visual
PNG dumps, orbax latest/best/final saves — with the side effects owned by
process 0 and the collective checkpoint calls on both.

Env: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES=2, JAX_PROCESS_ID,
XLA_FLAGS=--xla_force_host_platform_device_count=2, DIST_DATA (shared
synthetic CVOR root), DIST_RUN (shared log/ckpt root). Prints
ENGINE_OK step=<n> checksum=<param sum> on success.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the TPU relay

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    data_root = os.environ["DIST_DATA"]
    run_root = os.environ["DIST_RUN"]

    from accflow_tpu.train.engine import train_acc
    from accflow_tpu.utils.config import AttrDict

    opt = AttrDict(
        dict(
            exp_name="Acc+RAFT-dist",
            dataset_root=data_root,
            batch_per_gpu=1,  # 4 global devices -> global batch 4
            image_size=[64, 64],
            lr=1e-4, wdecay=1e-5, epsilon=1e-8, clip=1.0,
            epochs=1, add_noise=True,
            log_freq=1, valid_freq=2, visual_samples=[0],
            seed=0,
            log_dir=os.path.join(run_root, "logs"),
            ckpt_dir=os.path.join(run_root, "ckpt"),
            # tiny model knobs threaded through build_acc_model
            compute_dtype="float32",
        )
    )
    state = train_acc(opt, max_steps=2)

    assert jax.process_count() == 2, jax.process_count()
    step = int(state.step)
    checksum = float(
        sum(np.asarray(x, np.float64).sum() for x in jax.tree.leaves(state.params))
    )
    print(f"ENGINE_OK step={step} checksum={checksum:.6e}", flush=True)


if __name__ == "__main__":
    main()
