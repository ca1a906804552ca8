"""Multi-device SPMD tests on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from accflow_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params


def test_mesh_creation(cpu_devices):
    mesh = make_mesh()
    assert mesh.devices.size == len(cpu_devices)
    mesh2 = make_mesh(n_data=4, n_spatial=2)
    assert mesh2.shape == {"data": 4, "spatial": 2}


def test_data_parallel_raft_forward(cpu_devices):
    """RAFT forward over a batch sharded across all 8 devices produces the
    same result as unsharded execution."""
    from accflow_tpu.models import build_flow_estimator

    est = build_flow_estimator("raft", compute_dtype="float32")
    params = est.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32))

    fwd = jax.jit(lambda p, a, b: est.forward(p, a, b, iters=2)["flow_up"])
    ref = np.asarray(fwd(params, i1, i2))

    mesh = make_mesh()
    ps = shard_params(mesh, params)
    i1s = jax.device_put(i1, batch_sharding(mesh, 4))
    i2s = jax.device_put(i2, batch_sharding(mesh, 4))
    out = fwd(ps, i1s, i2s)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_dryrun_multichip():
    """The driver's multi-chip dry run: full training step over a
    data x spatial mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_spatial_sharding_conv_halo(cpu_devices):
    """Convs over a spatially-sharded image equal unsharded execution
    (GSPMD halo exchange)."""
    from accflow_tpu.models.encoders import basic_encoder, init_basic_encoder

    params = init_basic_encoder(jax.random.PRNGKey(0), 3, 64, "instance")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))

    fwd = jax.jit(lambda p, a: basic_encoder(p, a, "instance"))
    ref = np.asarray(fwd(params, x))

    mesh = make_mesh(n_data=2, n_spatial=4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial", None, None)))
    ps = jax.device_put(params, NamedSharding(mesh, P()))
    out = np.asarray(fwd(ps, xs))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spatial_sharded_raft_forward_matches(cpu_devices):
    """Full RAFT forward with the image HEIGHT sharded across devices ==
    unsharded execution — the multi-chip SERVING path for frames larger
    than one chip's HBM. GSPMD inserts conv halo exchanges and gathers
    fmap2 for the all-pairs correlation; outputs must be identical."""
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.parallel.mesh import make_mesh, shard_params

    est = build_flow_estimator("raft", compute_dtype="float32")
    params = est.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    i1 = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))

    fwd = jax.jit(lambda p, a, b: est.forward(p, a, b, iters=2)["flow_up"])
    ref = np.asarray(fwd(params, i1, i2))

    mesh = make_mesh(n_data=1, n_spatial=8)
    ps = shard_params(mesh, params)
    sh = NamedSharding(mesh, P(None, "spatial", None, None))
    out = fwd(ps, jax.device_put(i1, sh), jax.device_put(i2, sh))
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_spatial_sharded_ondemand_forward_matches(cpu_devices):
    """Spatially-sharded forward in the volume-free corr mode == the
    unsharded stored-volume path. This is the full high-resolution
    recipe: height split across chips (GSPMD conv halos) AND no
    O((HW)^2) volume materialized on any one of them."""
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.parallel.mesh import make_mesh, shard_params

    est_mm = build_flow_estimator("raft", compute_dtype="float32",
                                  corr_lookup="mm")
    est_od = build_flow_estimator("raft", compute_dtype="float32",
                                  corr_lookup="ondemand:64")
    params = est_mm.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    i1 = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))

    ref = np.asarray(
        jax.jit(lambda p, a, b: est_mm.forward(p, a, b, iters=2)["flow_up"])(
            params, i1, i2
        )
    )

    fwd = jax.jit(lambda p, a, b: est_od.forward(p, a, b, iters=2)["flow_up"])
    mesh = make_mesh(n_data=1, n_spatial=8)
    ps = shard_params(mesh, params)
    sh = NamedSharding(mesh, P(None, "spatial", None, None))
    out = fwd(ps, jax.device_put(i1, sh), jax.device_put(i2, sh))
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_maybe_init_distributed_noop_and_env(monkeypatch):
    """Multi-host entry point (SURVEY.md §5.8): no-op on a plain single
    host; env triggers call jax.distributed.initialize with the right
    arguments (stubbed — real DCN needs a pod)."""
    import accflow_tpu.parallel.mesh as M

    monkeypatch.delenv("ACCFLOW_DISTRIBUTED", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert M.maybe_init_distributed() is False

    calls = []

    class FakeDistributed:
        @staticmethod
        def initialize(**kw):
            calls.append(kw)

    monkeypatch.setattr(M.jax, "distributed", FakeDistributed)
    monkeypatch.setenv("ACCFLOW_DISTRIBUTED", "1")
    assert M.maybe_init_distributed() is True
    assert calls == [{}]

    monkeypatch.setenv("ACCFLOW_DISTRIBUTED", "")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host0:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert M.maybe_init_distributed() is True
    assert calls[-1] == {
        "coordinator_address": "host0:1234",
        "num_processes": 4,
        "process_id": 2,
    }


@pytest.mark.slow
def test_two_process_distributed_train_step():
    """REAL 2-process jax.distributed smoke (SURVEY.md §5.8): spawns two
    CPU processes (2 local devices each -> 4 global) that initialize
    through maybe_init_distributed's JAX_COORDINATOR_ADDRESS trigger,
    build the GLOBAL mesh, run one sharded gradient step, and verify the
    cross-process gradient psum against a single-process computation
    (tests/_dist_child.py; Gloo collectives over localhost). Proves the
    multi-host story beyond the monkeypatched unit test above."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES="2",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_PLATFORMS="cpu",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(repo, "tests", "_dist_child.py")],
            env=dict(env, JAX_PROCESS_ID=str(i)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "DIST_OK" in out, f"process {i} output:\n{out}"
    # Engine-style device_put of the full host batch works across
    # processes in this JAX (same-value semantics) — pinned here so a
    # regression to shard-building APIs is caught.
    assert "DIST_PATH device_put" in outs[0]


@pytest.mark.slow
def test_two_process_train_acc_engine(tmp_path):
    """2-process ENGINE soak (VERDICT r3 #3): the real train_acc engine —
    validation, EPE aggregation, PNG dumps, orbax latest/best/final
    checkpointing into a SHARED directory — runs 2 steps under
    jax.distributed with 4 global devices. Asserts the side-effect
    ownership contract: process 0 writes exactly one log file and the
    visual PNGs; both processes participate in the collective checkpoint
    saves; final params agree across processes (tests/_dist_engine_child.py)."""
    import os
    import socket
    import subprocess
    import sys

    from accflow_tpu.data.synthetic import write_synthetic_cvor

    data_root = str(tmp_path / "cvor")
    run_root = str(tmp_path / "run")
    write_synthetic_cvor(data_root, num_train=8, num_test=2, h=64, w=64)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
        JAX_NUM_PROCESSES="2",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_PLATFORMS="cpu",
        DIST_DATA=data_root,
        DIST_RUN=run_root,
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(repo, "tests", "_dist_engine_child.py")],
            env=dict(env, JAX_PROCESS_ID=str(i)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "ENGINE_OK step=2" in out, f"process {i} output:\n{out}"

    # Replicated params agree across processes after 2 psum'd steps.
    sums = [
        line.split("checksum=")[1].strip()
        for out in outs for line in out.splitlines() if "ENGINE_OK" in line
    ]
    assert len(sums) == 2 and sums[0] == sums[1], sums

    # Side-effect ownership: ONE log file (process 0's), the visual PNG
    # written once, and the shared checkpoint tree holding latest+final.
    logs = [f for f in os.listdir(os.path.join(run_root, "logs"))
            if f.endswith(".log")]
    assert len(logs) == 1, logs
    png_dir = os.path.join(run_root, "logs", "val", "im000")
    assert os.path.isdir(png_dir) and os.listdir(png_dir)
    for sub in ("latest", "final"):
        d = os.path.join(run_root, "ckpt", sub)
        assert os.path.isdir(d) and os.listdir(d), sub


@pytest.mark.slow
def test_sharded_acc_train_step_matches_unsharded(cpu_devices):
    """ONE full accumulator training step (fwd + bwd + AdamW update) with
    the batch sharded over the 8-device data axis == unsharded execution:
    same loss and same updated parameters (GSPMD inserts the gradient
    psums). This is the numeric check behind __graft_entry__'s
    dryrun_multichip, which only asserts execution."""
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.train.engine import TrainState, make_acc_train_step
    from accflow_tpu.train.optim import make_optimizer

    est = build_flow_estimator("raft", compute_dtype="float32", iters=2)
    acfg = AccFlowConfig(compute_dtype="float32")
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)
    tx, _ = make_optimizer(lr=1e-4, num_steps=10, wdecay=1e-5, clip=1.0)
    train_step, _ = make_acc_train_step(est, acfg, tx, add_noise=False)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (8, 64, 64, 21)).astype(np.float32))
    bflows = jnp.asarray(rng.uniform(-5, 5, (8, 64, 64, 10)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    def fresh_state():
        return TrainState(
            jax.tree.map(jnp.copy, acc_params), tx.init(acc_params), jnp.int32(0)
        )

    ref_state, ref_loss, _ = train_step(fresh_state(), ofe_params, imgs, bflows, key)
    ref_leaf = np.asarray(jax.tree.leaves(ref_state.params)[0])

    mesh = make_mesh(n_data=8, n_spatial=1)
    bsh = NamedSharding(mesh, P("data", None, None, None))
    rep = NamedSharding(mesh, P())
    state_s = jax.device_put(fresh_state(), rep)
    out_state, loss_s, _ = train_step(
        jax.device_put(state_s, rep),
        jax.device_put(ofe_params, rep),
        jax.device_put(imgs, bsh),
        jax.device_put(bflows, bsh),
        key,
    )
    np.testing.assert_allclose(float(loss_s), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(out_state.params)[0]), ref_leaf,
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_sharded_grad_accum_matches_unsharded_full_batch(cpu_devices):
    """grad_accum=2 under the 8-device data mesh == the unsharded
    full-batch step: the (N)->(k, m) micro-batch reshape crosses the
    sharded batch axis (GSPMD reshards per micro-batch) without changing
    the averaged gradients."""
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.train.engine import TrainState, make_acc_train_step
    from accflow_tpu.train.optim import make_optimizer

    est = build_flow_estimator("raft", compute_dtype="float32", iters=2)
    acfg = AccFlowConfig(compute_dtype="float32")
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)
    tx, _ = make_optimizer(lr=1e-4, num_steps=10, wdecay=1e-5, clip=1.0)

    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 255, (8, 48, 48, 21)).astype(np.float32))
    bflows = jnp.asarray(rng.uniform(-5, 5, (8, 48, 48, 10)).astype(np.float32))
    key = jax.random.PRNGKey(3)

    def fresh():
        return TrainState(
            jax.tree.map(jnp.copy, acc_params), tx.init(acc_params),
            jnp.int32(0),
        )

    step_full, _ = make_acc_train_step(est, acfg, tx, add_noise=False)
    ref_state, ref_loss, _ = step_full(fresh(), ofe_params, imgs, bflows, key)
    ref_leaf = np.asarray(jax.tree.leaves(ref_state.params)[0])

    step_ga, _ = make_acc_train_step(est, acfg, tx, add_noise=False,
                                     grad_accum=2)
    mesh = make_mesh(n_data=8, n_spatial=1)
    bsh = NamedSharding(mesh, P("data", None, None, None))
    rep = NamedSharding(mesh, P())
    out_state, loss_s, _ = step_ga(
        jax.device_put(fresh(), rep),
        jax.device_put(ofe_params, rep),
        jax.device_put(imgs, bsh),
        jax.device_put(bflows, bsh),
        key,
    )
    np.testing.assert_allclose(float(loss_s), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(out_state.params)[0]), ref_leaf,
        rtol=2e-4, atol=1e-5,
    )


def test_spatial_sharded_hires_serving_matches(cpu_devices):
    """The full hi-res serving recipe run multi-chip: the accumulator
    CLIP forward with the volume-free (ondemand) lookup, image height
    sharded over 8 devices == an unsharded stored-volume run. This is
    the projected 8-chip 2048^2 configuration (PARITY.md
    "High-resolution serving": height-sharded frames, GSPMD conv halos,
    no O((HW)^2) volume on any chip)."""
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import (
        AccFlowConfig,
        accflow_forward,
        init_accflow,
    )

    est_mm = build_flow_estimator("raft", compute_dtype="float32",
                                  corr_lookup="mm", iters=2)
    est_od = build_flow_estimator("raft", compute_dtype="float32",
                                  corr_lookup="ondemand:64", iters=2)
    acfg = AccFlowConfig(compute_dtype="float32")
    params = est_mm.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)
    rng = np.random.default_rng(3)
    images = jnp.asarray(
        rng.uniform(-1, 1, (5, 1, 128, 128, 3)).astype(np.float32)
    )

    def fwd(est):
        return jax.jit(
            lambda ap, op, ims: accflow_forward(
                ap, est.flow_fn(op), ims, acfg, ofe_pairs=est.pairs_fn(op)
            )
        )

    ref = np.asarray(fwd(est_mm)(acc_params, params, images))

    mesh = make_mesh(n_data=1, n_spatial=8)
    sh = NamedSharding(mesh, P(None, None, "spatial", None, None))
    out = fwd(est_od)(
        shard_params(mesh, acc_params), shard_params(mesh, params),
        jax.device_put(images, sh),
    )
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=1e-3)


def test_spatial_sharded_streaming_matches(cpu_devices):
    """The stateful streaming surface composed with a device mesh: init +
    two push steps with frame height sharded over 8 devices == the
    unsharded run, with the carried state tuple staying sharded on device
    between steps (VERDICT r4 weak #6: no test composed streaming with a
    mesh)."""
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.streaming import make_streaming_fns

    est = build_flow_estimator("raft", compute_dtype="float32", iters=2)
    acfg = AccFlowConfig(compute_dtype="float32", warm_start=True)
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)

    rng = np.random.default_rng(4)
    frames = jnp.asarray(
        rng.uniform(-1, 1, (5, 1, 128, 128, 3)).astype(np.float32)
    )

    init_fn, step_fn = make_streaming_fns(est, acfg, ofe_params, acc_params)
    out, state = jax.jit(init_fn)(frames[:3])
    refs = [np.asarray(out)]
    for i in (3, 4):
        out, state = jax.jit(step_fn)(state, frames[i])
        refs.append(np.asarray(out))

    mesh = make_mesh(n_data=1, n_spatial=8)
    init_s, step_s = make_streaming_fns(
        est, acfg, shard_params(mesh, ofe_params),
        shard_params(mesh, acc_params),
    )
    fsh = NamedSharding(mesh, P(None, "spatial", None, None))
    out, state = jax.jit(init_s)(
        jax.device_put(frames[:3], NamedSharding(
            mesh, P(None, None, "spatial", None, None)))
    )
    outs = [np.asarray(out)]
    for i in (3, 4):
        out, state = jax.jit(step_s)(state, jax.device_put(frames[i], fsh))
        outs.append(np.asarray(out))
    assert len(out.sharding.device_set) == 8

    for o, r in zip(outs, refs):
        np.testing.assert_allclose(o, r, rtol=1e-3, atol=1e-3)
