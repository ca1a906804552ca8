"""Streaming serving surface (accflow_tpu/streaming.py).

Pins that the stateful frame-by-frame path is EXACTLY the in-clip
warm-start recurrence (models/accflow.py::_accflow_forward_warmstart —
itself equivalence-tested against the stepwise reference semantics), that
the exported (init, step) artifact reproduces the live path, and that the
user-facing FlowStream handles padding/normalization like the clip API.
Small f32 models keep tolerances tight (conv batch-splitting is the only
numerical difference between the paths).
"""

import numpy as np
import pytest

T, N, H, W = 6, 1, 64, 48
ITERS = 2


@pytest.fixture(scope="module")
def setup():
    import jax

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow

    est = build_flow_estimator("raft", compute_dtype="float32", iters=ITERS)
    acfg = AccFlowConfig(compute_dtype="float32", warm_start=True)
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)
    rng = np.random.default_rng(0)
    frames = rng.uniform(-1, 1, (T, N, H, W, 3)).astype(np.float32)
    return est, acfg, ofe_params, acc_params, frames


def _clip_reference(setup_tuple):
    import jax.numpy as jnp

    from accflow_tpu.models.accflow import accflow_forward

    est, acfg, ofe_params, acc_params, frames = setup_tuple
    return np.asarray(
        accflow_forward(
            acc_params, est.flow_fn(ofe_params), jnp.asarray(frames), acfg
        )
    )


def test_stream_accumulator_matches_warmstart_clip(setup):
    from accflow_tpu.streaming import StreamAccumulator

    est, acfg, ofe_params, acc_params, frames = setup
    want = _clip_reference(setup)

    acc = StreamAccumulator(est, acfg, ofe_params, acc_params)
    outs = [np.asarray(acc.reset(frames[:3]))]
    for i in range(3, T):
        outs.append(np.asarray(acc.push(frames[i])))
    got = np.stack(outs, axis=0)
    assert got.shape == want.shape == (T - 2, N, H, W, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_stream_push_before_reset_raises(setup):
    from accflow_tpu.streaming import StreamAccumulator

    est, acfg, ofe_params, acc_params, frames = setup
    acc = StreamAccumulator(est, acfg, ofe_params, acc_params)
    with pytest.raises(RuntimeError, match="reset"):
        acc.push(frames[0])


def test_streaming_gma_matches_warmstart_clip():
    import jax

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.streaming import StreamAccumulator

    est = build_flow_estimator("gma", compute_dtype="float32", iters=2)
    acfg = AccFlowConfig(compute_dtype="float32", warm_start=True)
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)
    rng = np.random.default_rng(1)
    frames = rng.uniform(-1, 1, (4, 1, 48, 48, 3)).astype(np.float32)

    want = _clip_reference((est, acfg, ofe_params, acc_params, frames))
    acc = StreamAccumulator(est, acfg, ofe_params, acc_params)
    outs = [np.asarray(acc.reset(frames[:3]))]
    outs.append(np.asarray(acc.push(frames[3])))
    np.testing.assert_allclose(np.stack(outs), want, rtol=1e-4, atol=1e-4)


def test_streaming_export_roundtrip(setup, tmp_path):
    from accflow_tpu.streaming import (
        StreamAccumulator,
        export_streaming,
        load_streaming_artifact,
        save_streaming_artifact,
    )

    est, acfg, ofe_params, acc_params, frames = setup
    path = str(tmp_path / "stream.sflows")
    init_exp, step_exp = export_streaming(
        est, acfg, ofe_params, acc_params, (N, H, W)
    )
    save_streaming_artifact(path, init_exp, step_exp)
    art = load_streaming_artifact(path)
    assert art.frame_shape == (N, H, W, 3)

    live = StreamAccumulator(est, acfg, ofe_params, acc_params)
    a = [np.asarray(art.reset(frames[:3]))]
    b = [np.asarray(live.reset(frames[:3]))]
    for i in range(3, 5):
        a.append(np.asarray(art.push(frames[i])))
        b.append(np.asarray(live.push(frames[i])))
    np.testing.assert_allclose(np.stack(a), np.stack(b), rtol=1e-5, atol=1e-5)


def test_streaming_export_bf16_weights(setup, tmp_path):
    # weights_dtype="bfloat16" must produce a loadable artifact whose
    # outputs stay close to the f32-weight export (smoke-level tolerance:
    # the f32 compute path sees once-rounded weights).
    from accflow_tpu.streaming import (
        export_streaming,
        load_streaming_artifact,
        save_streaming_artifact,
    )

    est, acfg, ofe_params, acc_params, frames = setup
    path = str(tmp_path / "stream_bf16.sflows")
    init_exp, step_exp = export_streaming(
        est, acfg, ofe_params, acc_params, (N, H, W),
        weights_dtype="bfloat16",
    )
    save_streaming_artifact(path, init_exp, step_exp)
    art = load_streaming_artifact(path)
    out = np.asarray(art.reset(frames[:3]))
    assert out.shape == (N, H, W, 2) and np.isfinite(out).all()


def test_flow_stream_api(setup):
    """FlowPipeline.stream(): raw-uint8 frames, odd size (pad/unpad), and
    the seeding protocol (None for the first two sends)."""
    from accflow_tpu import FlowPipeline
    from accflow_tpu.ops.padding import InputPadder
    from accflow_tpu.streaming import StreamAccumulator

    est, acfg, ofe_params, acc_params, _ = setup
    pipe = FlowPipeline(est, ofe_params, acc_params, acfg, iters=ITERS)
    stream = pipe.stream(iters=ITERS)

    rng = np.random.default_rng(2)
    h, w = 36, 44  # pads to 40x48
    u8 = rng.integers(0, 255, (5, h, w, 3), dtype=np.uint8)

    assert stream.send(u8[0]) is None
    assert stream.send(u8[1]) is None
    outs = [stream.send(u8[i]) for i in range(2, 5)]
    assert all(o.shape == (h, w, 2) for o in outs)

    # Equals the raw StreamAccumulator on the padded normalized frames.
    norm = 2.0 * (u8.astype(np.float32) / 255.0) - 1.0
    padder = InputPadder((1, h, w, 3))
    padded = np.stack([padder.pad_np(f[None]) for f in norm], axis=0)
    acc = StreamAccumulator(est, acfg, ofe_params, acc_params)
    want = [np.asarray(acc.reset(padded[:3]))]
    want += [np.asarray(acc.push(padded[i])) for i in range(3, 5)]
    for got, w_ in zip(outs, want):
        np.testing.assert_allclose(
            got, np.asarray(padder.unpad(w_))[0], rtol=1e-5, atol=1e-5
        )


def test_pair_streaming_matches_evaluate_sequence(setup):
    import jax.numpy as jnp

    from accflow_tpu.streaming import make_pair_streaming_fns
    from accflow_tpu.train.evaluate import evaluate_sequence

    est, _, ofe_params, _, frames = setup
    want = np.asarray(
        evaluate_sequence(est, ofe_params, jnp.asarray(frames), iters=ITERS,
                          warm_start=True)
    )
    init_fn, step_fn = make_pair_streaming_fns(est, ofe_params)
    out, state = init_fn(frames[0], frames[1])
    got = [np.asarray(out)]
    for i in range(2, T):
        out, state = step_fn(state, frames[i])
        got.append(np.asarray(out))
    np.testing.assert_allclose(np.stack(got), want, rtol=1e-5, atol=1e-5)


_FIXTURES = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "fixtures"
)


@pytest.mark.skipif(
    not __import__("os").path.exists(
        __import__("os").path.join(_FIXTURES, "drift_small_ofe.npz")
    ),
    reason="drift fixture not built (scripts/make_drift_fixture.py)",
)
def test_long_stream_drift_bound():
    """EPE drift bound on a >=32-frame stream (VERDICT r4 item 1): the
    streaming surface run 5x past the reference's 7-frame clip horizon
    (networks/AccFlow_.py:157-175) on time-varying motion with a moving
    occluder, using committed tiny TRAINED weights (RAFT-small +
    hidden-64 accumulator; scripts/make_drift_fixture.py). Asserts the
    EPE(i) curve (i) stays within headroom of the curve recorded when the
    fixture was trained (regression guard for the streaming math) and
    (ii) does not blow up at the long end (drift bound: the late-horizon
    mean within 2x of the early-horizon mean + 1px)."""
    import os

    import jax

    from accflow_tpu.convert.store import load_params
    from accflow_tpu.data.synthetic import make_long_sequence
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig
    from accflow_tpu.streaming import StreamAccumulator

    f32 = lambda t: jax.tree.map(lambda a: np.asarray(a, np.float32), t)
    ofe_params = f32(load_params(os.path.join(_FIXTURES, "drift_small_ofe.npz")))
    acc_params = f32(load_params(os.path.join(_FIXTURES, "drift_small_acc.npz")))
    ref_curve = np.load(os.path.join(_FIXTURES, "drift_small_epe.npy"))

    # The exact sequence the fixture's recorded curve was measured on
    # (scripts/make_drift_fixture.py::drift_sequence).
    seq = make_long_sequence(
        np.random.default_rng(77), 64, 64, 36, seg_len=6, max_v=1,
        fg=True, fg_max_v=2,
    )
    est = build_flow_estimator("raft", compute_dtype="float32", small=True,
                               iters=6)
    acfg = AccFlowConfig(compute_dtype="float32", warm_start=True, hidden=64)
    acc = StreamAccumulator(est, acfg, ofe_params, acc_params)
    imgs = (2.0 * (seq["imgs"].astype(np.float32) / 255.0) - 1.0)[:, None]
    outs = [np.asarray(acc.reset(imgs[:3]))[0]]
    for i in range(3, imgs.shape[0]):
        outs.append(np.asarray(acc.push(imgs[i]))[0])
    outs = np.stack(outs)
    gt = seq["bflows"][1 : 1 + outs.shape[0]]
    curve = np.sqrt(((outs - gt) ** 2).sum(-1)).mean(axis=(1, 2))

    # (i) regression guard vs the recorded curve (f16 weights quantization
    # + backend differences get modest headroom).
    assert (curve <= ref_curve * 1.5 + 0.5).all(), (
        f"stream EPE regressed: {curve} vs recorded {ref_curve}"
    )
    # (ii) the drift bound itself: late horizons must not blow up.
    early = curve[2:8].mean()   # i = 4..9
    late = curve[-6:].mean()    # i = 30..35
    assert late <= 2.0 * early + 1.0, (
        f"accumulated drift: late EPE {late:.3f} vs early {early:.3f}"
    )


def test_stream_ini_init_carry_variant(setup):
    """The ini_init knob: invalid values fail loudly; 'carry' (the
    adjudicated-loser re-anchoring policy kept as a documented negative
    result — PARITY.md "Long-stream drift study") runs, matches 'ini' on
    the reset output (identical cold start), and diverges from it once
    the differing query seed has fed through a push."""
    from accflow_tpu.streaming import StreamAccumulator

    est, acfg, ofe_params, acc_params, frames = setup
    with pytest.raises(ValueError, match="ini_init"):
        StreamAccumulator(est, acfg, ofe_params, acc_params,
                          ini_init="bogus")

    a = StreamAccumulator(est, acfg, ofe_params, acc_params, ini_init="ini")
    b = StreamAccumulator(est, acfg, ofe_params, acc_params,
                          ini_init="carry")
    ra, rb = np.asarray(a.reset(frames[:3])), np.asarray(b.reset(frames[:3]))
    np.testing.assert_allclose(ra, rb, rtol=1e-6, atol=1e-6)
    pa = [np.asarray(a.push(frames[i])) for i in range(3, 5)]
    pb = [np.asarray(b.push(frames[i])) for i in range(3, 5)]
    assert all(np.isfinite(p).all() for p in pa + pb)
    # carry != ini once the seeds differ (flow_ini vs accumulated carry).
    assert np.abs(pa[-1] - pb[-1]).max() > 1e-6
