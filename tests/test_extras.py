"""Tests for auxiliary components: softmax splatting, extra losses, flow
viz, frame IO, config, checkpoint manager, converted-params store."""

import numpy as np
import pytest

import jax.numpy as jnp

from accflow_tpu.ops.softsplat import softsplat
from accflow_tpu.train.losses_extra import get_loss, l1_loss, multiscale_loss


def test_softsplat_identity_flow(rng):
    img = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    zero = np.zeros((2, 8, 8, 2), np.float32)
    out = np.asarray(softsplat(jnp.asarray(img), jnp.asarray(zero), mode="average"))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)


def test_softsplat_integer_shift(rng):
    img = rng.standard_normal((1, 8, 8, 1)).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 2.0  # shift right by 2
    out = np.asarray(softsplat(jnp.asarray(img), jnp.asarray(flow), mode="average"))
    np.testing.assert_allclose(out[0, :, 2:, 0], img[0, :, :-2, 0], rtol=1e-5, atol=1e-5)
    assert np.allclose(out[0, :, :2, 0], 0.0)  # nothing splatted there


def test_softsplat_softmax_prefers_high_metric(rng):
    # Two source pixels colliding on one target; softmax mode should weight
    # the one with (much) higher metric.
    img = np.zeros((1, 1, 4, 1), np.float32)
    img[0, 0, 0, 0] = 1.0
    img[0, 0, 1, 0] = 3.0
    flow = np.zeros((1, 1, 4, 2), np.float32)
    flow[0, 0, 0, 0] = 2.0  # -> x=2
    flow[0, 0, 1, 0] = 1.0  # -> x=2
    metric = np.zeros((1, 1, 4, 1), np.float32)
    metric[0, 0, 1, 0] = 20.0
    out = np.asarray(
        softsplat(jnp.asarray(img), jnp.asarray(flow), jnp.asarray(metric), "softmax")
    )
    assert abs(out[0, 0, 2, 0] - 3.0) < 1e-3


def test_loss_factory():
    assert get_loss("L1") is l1_loss
    with pytest.raises(NotImplementedError):
        get_loss("smooth")


def test_multiscale_loss_scales_target(rng):
    target = rng.standard_normal((1, 16, 16, 2)).astype(np.float32)
    preds = [
        jnp.asarray(rng.standard_normal((1, 16, 16, 2)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32)),
    ]
    loss = multiscale_loss(preds, jnp.asarray(target))
    assert np.isfinite(float(loss))


def test_flow_viz_shapes(rng):
    from accflow_tpu.utils.flow_viz import flow_to_image

    img = flow_to_image(rng.standard_normal((16, 16, 2)).astype(np.float32))
    assert img.shape == (16, 16, 3) and img.dtype == np.uint8


def test_flo_roundtrip(tmp_path, rng):
    from accflow_tpu.utils.frame_io import read_flow, write_flow

    flow = rng.standard_normal((8, 10, 2)).astype(np.float32)
    path = str(tmp_path / "x.flo")
    write_flow(path, flow)
    back = read_flow(path)
    np.testing.assert_allclose(back, flow, rtol=1e-6)


def test_config_attrdict(tmp_path):
    from accflow_tpu.utils.config import parse_options

    p = tmp_path / "c.yml"
    p.write_text("exp_name: Foo\nlr: 1.0e-4\nnested:\n  a: [1, 2]\n")
    opt = parse_options(str(p))
    assert opt.exp_name == "Foo" and opt.nested.a == [1, 2]
    assert opt.get("missing") is None


def test_params_store_roundtrip(tmp_path, rng):
    from accflow_tpu.convert.store import load_params, save_params

    tree = {"a": {"w": jnp.asarray(rng.standard_normal((3, 3)).astype(np.float32))},
            "b": jnp.asarray(np.float32(2.0))}
    path = str(tmp_path / "p.npz")
    save_params(path, tree)
    back = load_params(path)
    np.testing.assert_allclose(np.asarray(back["a"]["w"]), np.asarray(tree["a"]["w"]))


def test_checkpoint_manager_roundtrip(tmp_path):
    from accflow_tpu.train.checkpoint import CheckpointManager

    state = {"w": jnp.ones((4,)), "step": jnp.asarray(3)}
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=2)
    mgr.save(1, state)
    mgr.save(2, {"w": jnp.ones((4,)) * 2, "step": jnp.asarray(5)})
    assert mgr.latest_step() == 2
    back = mgr.restore(state)
    np.testing.assert_allclose(np.asarray(back["w"]), 2 * np.ones(4))
    mgr.close()


def test_count_parameters():
    from accflow_tpu.utils.logging import count_parameters

    params = {"a": {"w": np.zeros((3, 3, 8, 16)), "b": np.zeros((16,))},
              "c": np.zeros((5,))}
    assert count_parameters(params) == 3 * 3 * 8 * 16 + 16 + 5


def test_corr_single_scale_matches_pyramid_level0(rng):
    from accflow_tpu.ops.corr import (
        build_corr_pyramid,
        build_corr_single_scale,
        lookup_corr,
    )
    from accflow_tpu.ops.grids import coords_grid

    f1 = jnp.asarray(rng.standard_normal((1, 12, 12, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, 12, 12, 8)).astype(np.float32))
    single = build_corr_single_scale(f1, f2)
    pyr = build_corr_pyramid(f1, f2, num_levels=4)
    assert len(single.levels) == 1
    np.testing.assert_allclose(
        np.asarray(single.levels[0]), np.asarray(pyr.levels[0]), rtol=1e-6, atol=1e-6
    )
    coords = coords_grid(1, 12, 12)
    out = lookup_corr(single, coords, radius=4)
    assert out.shape == (1, 12, 12, 81)


def test_warmstart_constant_flow(rng):
    """A constant flow field forward-splats onto itself: interior values
    survive, and the scipy reference path agrees with the on-device one
    away from the advected boundary."""
    from accflow_tpu.ops.warmstart import (
        forward_interpolate_flow,
        forward_splat_flow,
    )

    h, w = 24, 24
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = 3.0  # dx
    flow[..., 1] = 2.0  # dy

    ref = forward_interpolate_flow(flow)
    dev = np.asarray(forward_splat_flow(jnp.asarray(flow)[None]))[0]
    # Interior (splat-covered) region: both must reproduce the constant.
    np.testing.assert_allclose(ref[6:-6, 6:-6], flow[6:-6, 6:-6], atol=1e-5)
    np.testing.assert_allclose(dev[6:-6, 6:-6], flow[6:-6, 6:-6], atol=1e-4)


def test_high_speed_sintel_layout(tmp_path, rng):
    """HighSpeedSintel reads the reference's directory layout
    (data/dataset.py:164-236): 2_imgs/, 43_imgs/, one .flo, one occ png."""
    import cv2

    from accflow_tpu.data.sintel import fetch_sintel_dataset
    from accflow_tpu.utils.frame_io import write_flow

    root = tmp_path / "seq_0001"
    (root / "2_imgs").mkdir(parents=True)
    (root / "43_imgs").mkdir()
    img = (rng.uniform(0, 255, (64, 128, 3))).astype(np.uint8)
    for i in range(2):
        cv2.imwrite(str(root / "2_imgs" / f"{i:02d}.png"), img)
    for i in range(13):
        cv2.imwrite(str(root / "43_imgs" / f"{i:02d}.png"), img)
    write_flow(str(root / "gt.flo"), rng.standard_normal((64, 128, 2)).astype(np.float32))
    cv2.imwrite(str(root / "occ.png"), (img[..., :1] > 127).astype(np.uint8) * 255)

    ds = fetch_sintel_dataset(str(tmp_path), interv=6)
    assert len(ds) == 1
    s = ds.get(0)
    assert s["gt_flow"].shape == (64, 128, 2)
    assert s["occ_mask"].shape == (64, 128, 1)
    assert len(s["sintel_imgs"]) == 2
    assert len(s["hs_sintel_imgs"]) == 3  # ceil(13 / 6)
    assert s["hs_sintel_imgs"][0].shape == (436, 1024, 3)


def test_test_cvo_sh_matches_reference_grid(tmp_path):
    """scripts/test_cvo.sh expands to exactly the reference's 16-run grid
    (/root/reference/test_cvo.sh): {clean,final} x {raft,gma} x
    {direct+ofe_ckpt, acc+acc_ckpt} x {things,cvo}. Runs the script with a
    recording `python` stub so the glue itself is executed."""
    import os
    import stat
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    log = tmp_path / "calls.log"
    stub_dir = tmp_path / "bin"
    stub_dir.mkdir()
    stub = stub_dir / "python"
    stub.write_text(f'#!/bin/bash\necho "$@" >> {log}\n')
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)

    env = dict(os.environ)
    env["PATH"] = f"{stub_dir}:{env['PATH']}"
    env["CKPT_DIR"] = "CK"
    env["DATA_ROOT"] = "DR"
    subprocess.run(
        ["bash", os.path.join(repo, "scripts", "test_cvo.sh")],
        check=True, env=env, cwd=repo,
    )

    calls = [line.split() for line in log.read_text().splitlines()]
    assert len(calls) == 16
    got = set()
    for args in calls:
        flags = dict(zip(args, args[1:]))
        ckpt = flags.get("--ofe_ckpt") or flags.get("--acc_ckpt")
        got.add((flags["-d"], flags["-acc"], flags["-ofe"], ckpt))
        assert flags["--dataset-root"] == "DR"
    want = set()
    for split in ("clean", "final"):
        for ofe in ("raft", "gma"):
            for tag in ("things", "cvo"):
                want.add((split, "direct", ofe, f"CK/{ofe}-{tag}.pth"))
                want.add((split, "acc", ofe, f"CK/acc+{ofe}-{tag}.pth"))
    assert got == want


def test_reference_noise_quirk():
    """train_acc.py:216-220 noise: clamp-to-[0,255] then 2x/255-1 keeps
    only the positive gaussian lobe and collapses the negative half to
    exactly -1 (the reference trained its released checkpoints this way).
    Pin those properties."""
    import jax
    import numpy as np

    from accflow_tpu.train.engine import reference_noise

    noise = np.asarray(
        reference_noise(jax.random.PRNGKey(3), (4, 16, 16, 3))
    )
    assert noise.shape == (4, 16, 16, 3)
    assert noise.min() >= -1.0 and noise.max() <= 1.0
    # Negative gaussian lobe clamps to exactly -1: ~half the entries.
    frac_floor = float((noise == -1.0).mean())
    assert 0.4 < frac_floor < 0.6
    # Positive lobe survives (stdv ~ U[0,5) of 255 is small but nonzero).
    assert float(noise.max()) > -1.0


def test_serving_export_roundtrip(tmp_path, rng):
    """Export the serving pipeline via jax.export, reload the artifact
    from disk, and check the flows match direct execution bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.serving import (
        build_serving_fn,
        export_serving,
        load_artifact,
        save_artifact,
    )

    est = build_flow_estimator("raft", compute_dtype="float32", iters=2)
    acfg = AccFlowConfig(compute_dtype="float32")
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)

    shape = (4, 1, 64, 64, 3)
    images = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    ref = np.asarray(
        jax.jit(build_serving_fn(est, acfg, ofe_params, acc_params))(images)
    )

    exported = export_serving(est, acfg, ofe_params, acc_params, shape)
    path = str(tmp_path / "acc_raft.sflow")
    save_artifact(exported, path)
    import os

    assert os.path.getsize(path) > 1_000_000  # weights baked in
    fn = load_artifact(path)
    out = np.asarray(fn(images))
    assert out.shape == (2, 1, 64, 64, 2)
    np.testing.assert_array_equal(out, ref)

    # The volume-free memory mode (lax.map + jax.checkpoint inside the
    # lookup) also survives export/reload, and matches the volume path.
    est_od = build_flow_estimator(
        "raft", compute_dtype="float32", iters=2, corr_lookup="ondemand:16"
    )
    exported_od = export_serving(est_od, acfg, ofe_params, acc_params, shape)
    path_od = str(tmp_path / "acc_raft_od.sflow")
    save_artifact(exported_od, path_od)
    out_od = np.asarray(load_artifact(path_od)(images))
    np.testing.assert_allclose(out_od, ref, rtol=1e-4, atol=1e-4)


def test_serving_export_polymorphic_batch(tmp_path, rng):
    """batch=None exports ONE artifact with a symbolic batch dim (jax
    shape polymorphism) that serves any batch >= 1, matching per-batch
    fixed exports; corr_lookup='auto' / attn_chunk=-1 cannot size their
    budgets on a symbolic batch and refuse with a clear error."""
    import jax
    import jax.numpy as jnp
    import pytest

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.serving import (
        build_serving_fn,
        export_serving,
        load_artifact,
        save_artifact,
    )

    est = build_flow_estimator("raft", compute_dtype="float32", iters=2)
    acfg = AccFlowConfig(compute_dtype="float32")
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)

    exported = export_serving(
        est, acfg, ofe_params, acc_params, (3, None, 32, 32, 3)
    )
    path = str(tmp_path / "acc_raft_poly.sflow")
    save_artifact(exported, path)
    fn = load_artifact(path)

    serve = jax.jit(build_serving_fn(est, acfg, ofe_params, acc_params))
    for n in (1, 3):
        images = jnp.asarray(
            rng.uniform(-1, 1, (3, n, 32, 32, 3)).astype(np.float32)
        )
        out = np.asarray(fn(images))
        assert out.shape == (1, n, 32, 32, 2)
        np.testing.assert_allclose(
            out, np.asarray(serve(images)), rtol=1e-5, atol=1e-5
        )

    # weights_dtype="bfloat16" halves the artifact and equals running the
    # serving fn on pre-cast params exactly
    from accflow_tpu.serving import cast_weights

    exp16 = export_serving(est, acfg, ofe_params, acc_params,
                           (3, 1, 32, 32, 3), weights_dtype="bfloat16")
    p16 = str(tmp_path / "w16.sflow")
    save_artifact(exp16, p16)
    pref = str(tmp_path / "wref.sflow")
    save_artifact(
        export_serving(est, acfg, ofe_params, acc_params, (3, 1, 32, 32, 3)),
        pref,
    )
    import os

    assert os.path.getsize(p16) < 0.6 * os.path.getsize(pref)
    images1 = jnp.asarray(rng.uniform(-1, 1, (3, 1, 32, 32, 3)).astype(np.float32))
    want16 = np.asarray(
        jax.jit(build_serving_fn(
            est, acfg, cast_weights(ofe_params, "bfloat16"),
            cast_weights(acc_params, "bfloat16"),
        ))(images1)
    )
    np.testing.assert_array_equal(np.asarray(load_artifact(p16)(images1)), want16)

    est_auto = build_flow_estimator("raft", compute_dtype="float32",
                                    iters=2, corr_lookup="auto")
    with pytest.raises(ValueError, match="symbolic"):
        export_serving(est_auto, acfg, ofe_params, acc_params,
                       (3, None, 32, 32, 3))
    est_gauto = build_flow_estimator("gma", compute_dtype="float32",
                                     iters=2, attn_chunk=-1)
    with pytest.raises(ValueError, match="symbolic"):
        export_serving(est_gauto, acfg, ofe_params,
                       init_accflow(jax.random.PRNGKey(1), acfg),
                       (3, None, 32, 32, 3))


def test_corr_lookup_experimental_fence(rng):
    """Supported corr_lookup spellings pass through; adjudicated-loser
    experiment variants (PARITY.md matrix) need an 'experimental:' prefix
    and still run equivalently under it (ops/corr.py::normalize_corr_lookup)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.ops.corr import normalize_corr_lookup

    for live in ("fused", "mm", "auto", "pallas_fused", "ondemand",
                 "ondemand:16"):
        assert normalize_corr_lookup(live) == live
    assert normalize_corr_lookup("experimental:packed2") == "packed2"
    assert (
        normalize_corr_lookup("experimental:fused_mix:mm,vpu_y,vpu_y,mm")
        == "fused_mix:mm,vpu_y,vpu_y,mm"
    )
    for loser in ("packed2", "fused_vy", "rows", "fused_mix:mm,mm,mm,mm"):
        with pytest.raises(ValueError, match="experimental"):
            normalize_corr_lookup(loser)

    i1 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    est = build_flow_estimator("raft", compute_dtype="float32", iters=2)
    params = est.init(jax.random.PRNGKey(0))
    want = est.forward(params, i1, i2)["flow_up"]

    est_bad = build_flow_estimator(
        "raft", compute_dtype="float32", iters=2, corr_lookup="packed2"
    )
    with pytest.raises(ValueError, match="experimental"):
        est_bad.forward(params, i1, i2)

    est_exp = build_flow_estimator(
        "raft", compute_dtype="float32", iters=2,
        corr_lookup="experimental:packed2",
    )
    got = est_exp.forward(params, i1, i2)["flow_up"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_timed_pair_median_discards_degenerate(monkeypatch):
    """The K-vs-2K helper must DISCARD non-positive subtractions (relay
    hiccups) and median the clean pairs — flooring once produced a 3e10
    frames/s capture (PARITY.md 'Bench variance') — and fail loudly when
    nothing clean remains."""
    from accflow_tpu.utils import profiling

    # Scripted perf_counter: each timing pair consumes 3 readings
    # (t0, t1, t2) -> dt = (t2-t1)-(t1-t0). Pair 1 degenerate (dt=0),
    # pairs 2-4: dt = 2, 4, 3 seconds (k=1) -> median 3.
    times = iter([0.0, 1.0, 2.0,        # (1-1)=0 -> discarded
                  0.0, 1.0, 4.0,        # 2
                  0.0, 1.0, 6.0,        # 4
                  0.0, 1.0, 5.0])       # 3
    monkeypatch.setattr(profiling.time, "perf_counter", lambda: next(times))
    f = lambda: 0.0
    assert profiling.timed_pair_median(f, f, (), k=1, repeats=3) == 3.0

    # All-degenerate: RuntimeError, never a floored number.
    bad = iter([0.0, 1.0, 2.0] * 9)
    monkeypatch.setattr(profiling.time, "perf_counter", lambda: next(bad))
    with pytest.raises(RuntimeError, match="non-positive"):
        profiling.timed_pair_median(f, f, (), k=1, repeats=3)
