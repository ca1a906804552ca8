"""FlowPipeline / ArtifactPipeline: the high-level inference API.

The pipeline packages the protocol preprocess (2x/255-1, test_cvo.py:32-50),
/8 replicate padding (networks/raft/utils/utils.py:7-28) and unpadding
around the estimator / accumulator calls; these tests pin that it is
numerically nothing more than that packaging (random weights, tiny odd
sizes so the pad/unpad path is real).
"""

import numpy as np
import pytest


H, W = 36, 44  # pads to 40x48


@pytest.fixture(scope="module")
def frames_u8():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    return np.stack([np.roll(base, 2 * i, axis=1) for i in range(3)], axis=0)


@pytest.fixture(scope="module")
def pipe():
    from accflow_tpu import FlowPipeline

    return FlowPipeline.from_checkpoint(
        "acc+raft", compute_dtype="float32", iters=2
    )


def _norm(u8):
    return 2.0 * (u8.astype(np.float32) / 255.0) - 1.0


def test_pair_flow_matches_est_forward(pipe, frames_u8):
    from accflow_tpu.ops.padding import InputPadder

    flow = pipe.pair_flow(frames_u8[0], frames_u8[1])
    assert flow.shape == (H, W, 2) and flow.dtype == np.float32

    i1, i2 = _norm(frames_u8[0])[None], _norm(frames_u8[1])[None]
    padder = InputPadder(i1.shape)
    p1, p2 = padder.pad(i1, i2)
    out = pipe.est.forward(pipe.params, p1, p2, iters=2, final_only=True)
    want = np.asarray(padder.unpad(out["flow_up"]))[0]
    np.testing.assert_allclose(flow, want, rtol=1e-5, atol=1e-5)

    # normalized=True on pre-scaled floats is the same call
    flow2 = pipe.pair_flow(_norm(frames_u8[0]), _norm(frames_u8[1]),
                           normalized=True)
    np.testing.assert_allclose(flow2, flow, rtol=1e-6, atol=1e-6)


def test_pair_flow_batched_and_gray(pipe, frames_u8):
    # batched NHWC: slot-for-slot equal to the single calls
    b1 = np.stack([frames_u8[0], frames_u8[1]])
    b2 = np.stack([frames_u8[1], frames_u8[2]])
    flows = pipe.pair_flow(b1, b2)
    assert flows.shape == (2, H, W, 2)
    np.testing.assert_allclose(
        flows[0], pipe.pair_flow(frames_u8[0], frames_u8[1]),
        rtol=1e-5, atol=1e-5,
    )

    # grayscale is replicated to RGB; alpha is dropped
    g = frames_u8[0][..., 0]
    rgb = np.stack([g] * 3, axis=-1)
    np.testing.assert_allclose(
        pipe.pair_flow(g, frames_u8[1][..., 0]),
        pipe.pair_flow(rgb, np.stack([frames_u8[1][..., 0]] * 3, -1)),
        rtol=1e-6, atol=1e-6,
    )
    rgba = np.concatenate([frames_u8[0], frames_u8[0][..., :1]], axis=-1)
    np.testing.assert_allclose(
        pipe.pair_flow(rgba, frames_u8[1]),
        pipe.pair_flow(frames_u8[0], frames_u8[1]),
        rtol=1e-6, atol=1e-6,
    )


def test_occlusion_matches_protocol(pipe, frames_u8):
    """pipe.occlusion == calc_occ_mask over the two pair_flow directions
    (the eval protocol's bidirectional check, test_cvo.py:53-78)."""
    import jax.numpy as jnp

    from accflow_tpu.ops.occlusion import calc_occ_mask

    flow, occ = pipe.occlusion(frames_u8[0], frames_u8[1])
    assert flow.shape == (H, W, 2) and occ.shape == (H, W, 1)
    assert set(np.unique(occ)) <= {0.0, 1.0}

    fwd = pipe.pair_flow(frames_u8[0], frames_u8[1])
    bwd = pipe.pair_flow(frames_u8[1], frames_u8[0])
    np.testing.assert_allclose(flow, fwd, rtol=1e-5, atol=1e-5)
    # the mask thresholds padded flows; recompute on the same padded grid
    from accflow_tpu.ops.padding import InputPadder

    i1 = _norm(frames_u8[0])[None]
    padder = InputPadder(i1.shape)
    _, occ_fw = calc_occ_mask(
        jnp.asarray(padder.pad_np(bwd[None])),
        jnp.asarray(padder.pad_np(fwd[None])),
    )
    np.testing.assert_array_equal(
        occ, np.asarray(padder.unpad(occ_fw))[0]
    )


def test_pairs_matches_evaluate_sequence(pipe, frames_u8):
    from accflow_tpu.ops.padding import InputPadder
    from accflow_tpu.train.evaluate import evaluate_sequence

    flows = pipe.pairs(frames_u8, warm_start=True)
    assert flows.shape == (2, H, W, 2)

    clip = _norm(frames_u8)[:, None]
    padder = InputPadder(clip.shape)
    padded = np.stack([np.asarray(padder.pad(f)[0]) for f in clip], axis=0)
    want = np.asarray(
        padder.unpad(
            evaluate_sequence(pipe.est, pipe.params, padded, iters=2,
                              warm_start=True)
        )
    )[:, 0]
    np.testing.assert_allclose(flows, want, rtol=1e-5, atol=1e-5)

    # a list of HWC frames is the same sequence
    flows_list = pipe.pairs(list(frames_u8), warm_start=True)
    np.testing.assert_allclose(flows_list, flows, rtol=1e-6, atol=1e-6)


def test_long_range_matches_accflow_forward(pipe, frames_u8):
    from accflow_tpu.models.accflow import accflow_forward
    from accflow_tpu.ops.padding import InputPadder

    outs = pipe.long_range(frames_u8)
    assert outs.shape == (1, H, W, 2)

    clip = _norm(frames_u8)[:, None]
    padder = InputPadder(clip.shape)
    padded = np.stack([np.asarray(padder.pad(f)[0]) for f in clip], axis=0)
    want = accflow_forward(
        pipe.acc_params,
        lambda a, b, flow_init=None: pipe.est.forward(
            pipe.params, a, b, iters=2, flow_init=flow_init, final_only=True
        )["flow_up"],
        padded, pipe.acfg,
        ofe_pairs=pipe.est.pairs_fn(pipe.params, iters=2),
    )
    want = np.asarray(padder.unpad(want))[:, 0]
    np.testing.assert_allclose(outs, want, rtol=1e-5, atol=1e-5)

    # batched (T, N, H, W, 3) keeps the batch axis
    outs_b = pipe.long_range(_norm(frames_u8)[:, None], normalized=True)
    assert outs_b.shape == (1, 1, H, W, 2)
    np.testing.assert_allclose(outs_b[:, 0], outs, rtol=1e-6, atol=1e-6)


def test_artifact_pipeline_matches_flow_pipeline(pipe, frames_u8, tmp_path):
    from accflow_tpu import FlowPipeline
    from accflow_tpu.serving import export_serving, save_artifact

    exported = export_serving(
        pipe.est, pipe.acfg, pipe.params, pipe.acc_params, (3, 1, 40, 48, 3)
    )
    path = str(tmp_path / "tiny.sflow")
    save_artifact(exported, path)

    apipe = FlowPipeline.from_artifact(path)
    assert apipe.clip_shape == (3, 1, 40, 48, 3)
    outs = apipe.long_range(frames_u8)
    np.testing.assert_allclose(
        outs, pipe.long_range(frames_u8), rtol=1e-4, atol=1e-4
    )

    with pytest.raises(ValueError, match="3-frame"):
        apipe.long_range(np.repeat(frames_u8, 2, axis=0))
    with pytest.raises(ValueError, match="re-export"):
        apipe.long_range(np.zeros((3, 64, 64, 3), np.uint8))
    with pytest.raises(ValueError, match="batch"):
        apipe.long_range(np.repeat(_norm(frames_u8)[:, None], 2, axis=1),
                         normalized=True)

    # batch-polymorphic artifact (batch=None): any batch without re-export.
    # The auto memory mode cannot size its budget on a symbolic batch, so
    # polymorphic exports need an explicit corr_lookup.
    from accflow_tpu.models import build_flow_estimator

    with pytest.raises(ValueError, match="symbolic"):
        export_serving(pipe.est, pipe.acfg, pipe.params, pipe.acc_params,
                       (3, None, 40, 48, 3))
    est_f = build_flow_estimator("raft", compute_dtype="float32", iters=2,
                                 corr_lookup="fused")
    poly = export_serving(
        est_f, pipe.acfg, pipe.params, pipe.acc_params, (3, None, 40, 48, 3)
    )
    ppath = str(tmp_path / "poly.sflow")
    save_artifact(poly, ppath)
    ppipe = FlowPipeline.from_artifact(ppath)
    clip2 = np.repeat(_norm(frames_u8)[:, None], 2, axis=1)
    outs2 = ppipe.long_range(clip2, normalized=True)
    assert outs2.shape == (1, 2, H, W, 2)
    np.testing.assert_allclose(outs2[:, 0], outs, rtol=1e-4, atol=1e-4)


def test_api_errors(pipe, frames_u8):
    from accflow_tpu import FlowPipeline

    with pytest.raises(ValueError, match="disagree"):
        pipe.pair_flow(frames_u8[0], frames_u8[1][:-2])
    with pytest.raises(ValueError, match=">= 3 frames"):
        pipe.long_range(frames_u8[:2])
    with pytest.raises(ValueError, match="SEQUENCE"):
        pipe.pairs(frames_u8[0])
    with pytest.raises(ValueError, match="RGB"):
        pipe.pair_flow(np.zeros((8, 8, 5)), np.zeros((8, 8, 5)))

    ofe_only = FlowPipeline(pipe.est, pipe.params)
    with pytest.raises(ValueError, match="accumulator weights"):
        ofe_only.long_range(frames_u8)

    # float-scale footguns are errors, not silently crushed inputs
    with pytest.raises(ValueError, match=r"\[0, 1\]-scaled"):
        pipe.pair_flow(np.random.default_rng(0).uniform(0, 1, (8, 8, 3)),
                       np.zeros((8, 8, 3)) + 0.5)
    with pytest.raises(ValueError, match="already normalized"):
        pipe.pair_flow(_norm(frames_u8[0]), _norm(frames_u8[1]))


def test_pipeline_gma(frames_u8):
    """from_checkpoint('acc+gma') threads the cross-model knobs (iters,
    corr_lookup, attn_chunk) through the GMA config filter and runs both
    inference modes."""
    from accflow_tpu import FlowPipeline

    pipe = FlowPipeline.from_checkpoint(
        "acc+gma", compute_dtype="float32", iters=2, corr_lookup="mm",
        attn_chunk=8,
    )
    flow = pipe.pair_flow(frames_u8[0], frames_u8[1])
    assert flow.shape == (H, W, 2) and np.isfinite(flow).all()
    outs = pipe.long_range(frames_u8)
    assert outs.shape == (1, H, W, 2) and np.isfinite(outs).all()


def test_from_checkpoint_routing(monkeypatch):
    """ofe_ckpt loads the estimator even when the acc branch is active
    (random-init accumulator); acc_ckpt+ofe_ckpt together is an error."""
    from accflow_tpu import FlowPipeline
    import accflow_tpu.convert.torch_weights as tw

    calls = {}

    def fake_load_est(path, template):
        calls["ofe"] = path
        return template

    monkeypatch.setattr(tw, "load_flow_estimator_checkpoint", fake_load_est)
    pipe = FlowPipeline.from_checkpoint(
        "acc+raft", ofe_ckpt="raft-things.pth",
        compute_dtype="float32", iters=2,
    )
    assert calls["ofe"] == "raft-things.pth"
    assert pipe.acc_params is not None  # random-init accumulator present

    with pytest.raises(ValueError, match="not both"):
        FlowPipeline.from_checkpoint("acc+raft", ofe_ckpt="a.pth",
                                     acc_ckpt="b.pth")
