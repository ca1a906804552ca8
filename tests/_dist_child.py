"""Child process for the 2-process jax.distributed smoke test
(tests/test_sharding.py::test_two_process_distributed_train_step).

Run with env: JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES=2,
JAX_PROCESS_ID, and XLA_FLAGS=--xla_force_host_platform_device_count=2
(2 local CPU devices per process -> 4 global). Initializes via
parallel/mesh.py::maybe_init_distributed (the engines' entry point),
builds the GLOBAL mesh, runs one tiny sharded gradient step, and checks
the cross-process gradient psum against a single-process computation of
the same full batch. Prints DIST_OK on success.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the TPU relay

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from accflow_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding,
    make_mesh,
    maybe_init_distributed,
    replicated,
    shard_params,
)


def main():
    assert maybe_init_distributed(), "env triggers missing"
    assert jax.process_count() == 2, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 2 * n_local, (n_global, n_local)

    import jax.numpy as jnp

    from accflow_tpu.nn.layers import conv2d, init_conv

    mesh = make_mesh()  # global mesh over all 4 devices
    assert mesh.devices.size == n_global

    params = init_conv(jax.random.PRNGKey(0), 3, 8, 3)
    params = shard_params(mesh, params)

    # Deterministic full batch, known to every process (so the
    # single-process reference below sees identical data).
    rng = np.random.default_rng(0)
    batch = n_global  # one sample per global device
    x_full = rng.standard_normal((batch, 8, 8, 3)).astype(np.float32)
    y_full = rng.standard_normal((batch, 8, 8, 8)).astype(np.float32)

    sh = batch_sharding(mesh, 4)

    def to_global(a):
        """Engine-style device_put first (same full array on every host);
        fall back to explicit per-process shards if this JAX rejects it."""
        try:
            return jax.device_put(a, sh), "device_put"
        except Exception:
            pid = jax.process_index()
            local = a[pid * (batch // 2) : (pid + 1) * (batch // 2)]
            return (
                jax.make_array_from_process_local_data(sh, local),
                "make_array_from_process_local_data",
            )

    x, how_x = to_global(x_full)
    y, _ = to_global(y_full)
    if jax.process_index() == 0:
        print(f"DIST_PATH {how_x}", flush=True)

    def loss_fn(p, x, y):
        return jnp.mean((conv2d(p, x) - y) ** 2)

    step = jax.jit(
        jax.value_and_grad(loss_fn),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    loss, grads = step(params, x, y)
    loss = float(loss)

    # Single-process reference on the full batch (local devices only).
    p_local = init_conv(jax.random.PRNGKey(0), 3, 8, 3)
    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(
        p_local, jnp.asarray(x_full), jnp.asarray(y_full)
    )
    np.testing.assert_allclose(loss, float(ref_loss), rtol=1e-6)
    for k in grads:
        np.testing.assert_allclose(
            np.asarray(grads[k]), np.asarray(ref_grads[k]), rtol=1e-5, atol=1e-6
        )

    print("DIST_OK", flush=True)


if __name__ == "__main__":
    main()
