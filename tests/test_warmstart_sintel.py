"""Warm-start ops + consumers (reference README.md:11 TODO; upstream
splat semantics networks/raft/utils/utils.py:31-63) and the High-Speed
Sintel evaluation engine (consumer for the reference's dead loader,
data/dataset.py:164-236)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_forward_splat_flow_constant_translation():
    """A constant integer flow advects itself onto a shifted grid: the
    splat must reproduce the constant on the interior and leave zeros in
    the uncovered border stripe (the scipy fill-0-outside-hull prior)."""
    from accflow_tpu.ops.warmstart import forward_splat_flow

    h, w = 12, 16
    flow = jnp.broadcast_to(jnp.asarray([3.0, -2.0]), (1, h, w, 2))
    out = np.asarray(forward_splat_flow(flow))[0]
    # Targets: x+3 (covered for x>=3), y-2 (covered for y<=h-3).
    np.testing.assert_allclose(
        out[: h - 2, 3:],
        np.broadcast_to([3.0, -2.0], out[: h - 2, 3:].shape),
        atol=1e-5,
    )
    assert np.all(out[:, :3] == 0.0) and np.all(out[h - 2 :, :] == 0.0)


def test_forward_splat_flow_advect_field():
    """Splatting along a SEPARATE advection field (the -dflow backward
    pair convention, models/accflow.py warm start)."""
    from accflow_tpu.ops.warmstart import forward_splat_flow

    h, w = 8, 8
    flow = jnp.broadcast_to(jnp.asarray([0.5, 0.25]), (1, h, w, 2))
    advect = jnp.broadcast_to(jnp.asarray([2.0, 0.0]), (1, h, w, 2))
    out = np.asarray(forward_splat_flow(flow, advect))[0]
    np.testing.assert_allclose(
        out[:, 2:], np.broadcast_to([0.5, 0.25], out[:, 2:].shape), atol=1e-5
    )
    assert np.all(out[:, :2] == 0.0)


def test_forward_interpolate_scipy_parity():
    """The host-side scipy version (reference-exact semantics) agrees with
    the on-device splat on a constant integer field's interior."""
    scipy = pytest.importorskip("scipy")  # noqa: F841
    from accflow_tpu.ops.warmstart import (
        forward_interpolate_flow,
        forward_splat_flow,
    )

    h, w = 10, 12
    flow = np.broadcast_to(np.asarray([2.0, 1.0], np.float32), (h, w, 2)).copy()
    ref = forward_interpolate_flow(flow)
    ours = np.asarray(forward_splat_flow(jnp.asarray(flow)[None]))[0]
    # scipy 'nearest' extrapolates to the whole grid; compare covered area.
    np.testing.assert_allclose(ours[1:, 2:], ref[1:, 2:], atol=1e-5)


def test_flow_init_zero_equals_cold_start():
    """flow_init plumbing: an all-zero init must reproduce the cold
    start exactly (raft.py:123-124 semantics)."""
    from accflow_tpu.models import build_flow_estimator

    est = build_flow_estimator("raft", compute_dtype="float32")
    params = est.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    cold = est.forward(params, i1, i2, iters=3, final_only=True)["flow_up"]
    warm = est.forward(
        params, i1, i2, iters=3, flow_init=jnp.zeros((1, 8, 8, 2)),
        final_only=True,
    )["flow_up"]
    np.testing.assert_allclose(np.asarray(warm), np.asarray(cold), atol=1e-6)


def test_accflow_warmstart_forward():
    """AccFlowConfig.warm_start: stepwise accumulation with warm-started
    OFE queries runs, returns the reference shapes, and stays finite."""
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import (
        AccFlowConfig,
        accflow_forward,
        init_accflow,
    )

    rng = np.random.default_rng(4)
    est = build_flow_estimator("raft", compute_dtype="float32", iters=2)
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(
        jax.random.PRNGKey(1), AccFlowConfig(compute_dtype="float32")
    )
    frames = jnp.asarray(
        np.moveaxis(rng.uniform(-1, 1, (4, 1, 3, 64, 64)).astype(np.float32), 2, -1)
    )
    cfg = AccFlowConfig(compute_dtype="float32", warm_start=True, ofe_iters=2)
    outs = accflow_forward(acc_params, est.flow_fn(ofe_params), frames, cfg)
    assert outs.shape == (2, 1, 64, 64, 2)
    assert np.isfinite(np.asarray(outs)).all()


def test_evaluate_sequence_warm_start():
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.train.evaluate import evaluate_sequence

    rng = np.random.default_rng(5)
    est = build_flow_estimator("raft", compute_dtype="float32")
    params = est.init(jax.random.PRNGKey(0))
    frames = jnp.asarray(
        np.moveaxis(rng.uniform(-1, 1, (3, 1, 3, 64, 64)).astype(np.float32), 2, -1)
    )
    flows = evaluate_sequence(est, params, frames, iters=2, warm_start=True)
    assert flows.shape == (2, 1, 64, 64, 2)
    assert np.isfinite(np.asarray(flows)).all()
    cold = evaluate_sequence(est, params, frames, iters=2, warm_start=False)
    assert cold.shape == flows.shape


def test_stream_quality_table(tmp_path):
    """The streaming-quality harness (scripts/bench_stream.py::
    quality_table) at toy scale: CVO-protocol EPE rows for cold/warm
    configs with shared weights — correct schema, finite values. (The
    on-TPU bench runs the same function after fine-tuning on synthetic
    data; README "Streaming mode" carries its numbers.)"""
    import os.path as osp
    import sys

    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__)))))
    from scripts.bench_stream import quality_table

    from accflow_tpu.data.synthetic import write_synthetic_cvor
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow

    root = write_synthetic_cvor(
        str(tmp_path / "cvor"), num_train=2, num_test=2, h=64, w=64
    )
    est = build_flow_estimator("raft", compute_dtype="float32")
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(
        jax.random.PRNGKey(1), AccFlowConfig(compute_dtype="float32")
    )
    rows = quality_table(
        root, ofe_params, acc_params,
        configs=(("cold2", 2, False), ("warm2", 2, True)),
        batch=2, compute_dtype="float32",
        result_file=str(tmp_path / "res.txt"),
    )
    assert [r["name"] for r in rows] == ["cold2", "warm2"]
    for r in rows:
        assert np.isfinite([r["epe_all"], r["epe_occ"], r["epe_vis"]]).all()


@pytest.fixture()
def sintel_dir(tmp_path):
    """Synthetic High-Speed Sintel directory: three samples, each with
    2_imgs/, 43_imgs/ (5 frames), a .flo GT and an occlusion png."""
    cv2 = pytest.importorskip("cv2")
    from accflow_tpu.utils.frame_io import write_flow

    rng = np.random.default_rng(7)
    root = tmp_path / "hs_sintel"
    h, w = 32, 64
    for s in range(3):
        sample = root / f"alley_1_{s:04d}"
        (sample / "2_imgs").mkdir(parents=True)
        (sample / "43_imgs").mkdir()
        for i in range(2):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(str(sample / "2_imgs" / f"frame_{i}.png"), img)
        for i in range(5):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            cv2.imwrite(str(sample / "43_imgs" / f"frame_{i:02d}.png"), img)
        write_flow(
            str(sample / "flow.flo"),
            rng.uniform(-2, 2, (h, w, 2)).astype(np.float32),
        )
        occ = (rng.uniform(size=(h, w)) > 0.7).astype(np.uint8) * 255
        cv2.imwrite(str(sample / "occ.png"), np.repeat(occ[..., None], 3, -1))
    return str(root)


@pytest.mark.parametrize("mode", ["direct|raft", "acc|raft", "acc|gma"])
def test_evaluate_sintel_synthetic(sintel_dir, mode):
    """evaluate_sintel over the synthetic fixture: loader semantics
    (subsampling, resize), padder round-trip, both model modes and both
    estimators, finite metrics."""
    from accflow_tpu.train.evaluate import evaluate_sintel

    result = evaluate_sintel(
        mode,
        sintel_dir,
        interv=2,  # 5 frames -> T=3 (acc needs >= 3)
        iters=2,
        compute_dtype="float32",
        size=(64, 32),
    )
    assert set(result) == {"all", "occ", "noc"}
    assert all(np.isfinite(v) for v in result.values())


def test_evaluate_sintel_batched_equals_per_sample(sintel_dir):
    """Sample batching (batch=2 over 3 samples: one full + one padded
    partial batch) must reproduce the per-sample (batch=1) metrics —
    instance norm is per-sample and the padding is trimmed."""
    import jax

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.train.evaluate import evaluate_sintel

    est = build_flow_estimator("raft", compute_dtype="float32")
    params = est.init(jax.random.PRNGKey(0))
    kw = dict(interv=2, iters=2, compute_dtype="float32", size=(64, 32),
              params=params)
    r1 = evaluate_sintel("direct|raft", sintel_dir, batch=1, **kw)
    r2 = evaluate_sintel("direct|raft", sintel_dir, batch=2, **kw)
    for k in ("all", "occ", "noc"):
        np.testing.assert_allclose(r2[k], r1[k], rtol=1e-5, atol=1e-5)
