"""Demo CLI: flow inference over a directory of raw image frames.

Covers both modes end-to-end (random weights, tiny frames, odd sizes so
the InputPadder pad/unpad path is exercised): consecutive pairs with warm
start, and long-range accumulation.
"""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def frame_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("demo_frames")
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (36, 44, 3), dtype=np.uint8)
    for i in range(3):
        # shift the pattern so flows are non-degenerate
        img = np.roll(base, shift=2 * i, axis=1)
        Image.fromarray(img).save(d / f"frame_{i:03d}.png")
    return str(d)


def _read(out_dir, name):
    from accflow_tpu.utils.frame_io import read_flow

    path = os.path.join(out_dir, name)
    assert os.path.exists(path), sorted(os.listdir(out_dir))
    return read_flow(path)


def test_demo_pairs_mode(frame_dir, tmp_path):
    from accflow_tpu.cli.demo import main

    out = str(tmp_path / "out_pairs")
    main(["--frames", frame_dir, "--out", out, "--iters", "2",
          "--warm_start", "--compute-dtype", "float32"])
    for a, b in (("000", "001"), ("001", "002")):
        flow = _read(out, f"frame_{a}_to_frame_{b}.flo")
        assert flow.shape == (36, 44, 2)
        assert np.isfinite(flow).all()
        # viz PNG written alongside by default
        assert os.path.exists(
            os.path.join(out, f"frame_{a}_to_frame_{b}.png")
        )


def test_demo_pairs_ondemand_lookup(frame_dir, tmp_path):
    """--corr_lookup ondemand (volume-free hi-res mode) produces the same
    flows as the default materialized-volume path."""
    from accflow_tpu.cli.demo import main

    out_ref = str(tmp_path / "out_ref")
    main(["--frames", frame_dir, "--out", out_ref, "--iters", "2",
          "--compute-dtype", "float32", "--corr_lookup", "mm"])
    out_od = str(tmp_path / "out_od")
    main(["--frames", frame_dir, "--out", out_od, "--iters", "2",
          "--compute-dtype", "float32", "--corr_lookup", "ondemand:8",
          "--no_viz"])
    ref = _read(out_ref, "frame_000_to_frame_001.flo")
    got = _read(out_od, "frame_000_to_frame_001.flo")
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_demo_occ_mode(frame_dir, tmp_path):
    """--occ writes an occlusion-mask PNG next to each pair flow."""
    from PIL import Image

    from accflow_tpu.cli.demo import main

    out = str(tmp_path / "out_occ")
    main(["--frames", frame_dir, "--out", out, "--iters", "2", "--occ",
          "--no_viz", "--compute-dtype", "float32"])
    flow = _read(out, "frame_000_to_frame_001.flo")
    assert flow.shape == (36, 44, 2)
    mask = np.asarray(
        Image.open(os.path.join(out, "frame_000_to_frame_001_occ.png"))
    )
    assert mask.shape == (36, 44)
    assert set(np.unique(mask)) <= {0, 255}


def test_demo_long_mode(frame_dir, tmp_path):
    from accflow_tpu.cli.demo import main

    out = str(tmp_path / "out_long")
    main(["--frames", frame_dir, "--out", out, "--mode", "long",
          "--iters", "2", "--no_viz", "--compute-dtype", "float32"])
    flow = _read(out, "frame_002_to_frame_000.flo")
    assert flow.shape == (36, 44, 2)
    assert np.isfinite(flow).all()
    assert not os.path.exists(
        os.path.join(out, "frame_002_to_frame_000.png")
    )


def test_demo_artifact_mode(frame_dir, tmp_path):
    """Export a serving artifact, then run the demo purely from it (no
    model code / checkpoint on the inference path)."""
    import jax

    from accflow_tpu.cli.demo import main
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.serving import export_serving, save_artifact

    est = build_flow_estimator("raft", compute_dtype="float32", iters=2)
    acfg = AccFlowConfig(compute_dtype="float32")
    # 36x44 frames pad to 40x48 under the sintel-mode InputPadder.
    exported = export_serving(
        est, acfg, est.init(jax.random.PRNGKey(0)),
        init_accflow(jax.random.PRNGKey(1), acfg), (3, 1, 40, 48, 3),
    )
    path = str(tmp_path / "acc_raft_tiny.sflow")
    save_artifact(exported, path)

    out = str(tmp_path / "out_artifact")
    main(["--frames", frame_dir, "--out", out, "--artifact", path,
          "--no_viz"])
    flow = _read(out, "frame_002_to_frame_000.flo")
    assert flow.shape == (36, 44, 2)
    assert np.isfinite(flow).all()

    # Size mismatch is a clear user error, not a crash.
    with pytest.raises(SystemExit, match="re-export"):
        from PIL import Image

        d = tmp_path / "big"
        d.mkdir()
        for i in range(3):
            Image.fromarray(
                np.zeros((64, 64, 3), np.uint8)
            ).save(d / f"f{i}.png")
        main(["--frames", str(d), "--out", out, "--artifact", path])


def test_demo_video_extraction(tmp_path):
    """--video: frames come out of OpenCV decode in RGB order, stride and
    cap respected; --frames/--video are mutually exclusive."""
    cv2 = pytest.importorskip("cv2")

    from accflow_tpu.cli.demo import extract_video_frames, main
    from accflow_tpu.utils.frame_io import read_gen

    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (48, 32))
    if not w.isOpened():
        pytest.skip("OpenCV build lacks the MJPG encoder")
    rng = np.random.default_rng(0)
    frames = []
    for _ in range(6):
        rgb = rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)
        frames.append(rgb)
        w.write(rgb[..., ::-1])  # writer expects BGR
    w.release()

    files = extract_video_frames(path, str(tmp_path / "fr"), stride=2,
                                 limit=3)
    assert len(files) == 3
    assert [f.split("frame_")[-1] for f in files] == [
        "000000.png", "000002.png", "000004.png"
    ]
    # RGB round trip (MJPG is lossy; just check gross channel order)
    got = np.asarray(read_gen(files[0])).astype(np.int32)
    want = frames[0].astype(np.int32)
    direct = np.abs(got - want).mean()
    swapped = np.abs(got[..., ::-1] - want).mean()
    assert direct < swapped

    with pytest.raises(SystemExit, match="exactly one"):
        main(["--frames", "x", "--video", "y", "--out", str(tmp_path)])
    with pytest.raises(SystemExit, match="exactly one"):
        main(["--out", str(tmp_path)])
    with pytest.raises(SystemExit, match="video_stride"):
        extract_video_frames(path, str(tmp_path / "fr2"), stride=0, limit=3)


def test_demo_rejects_single_frame(tmp_path):
    from PIL import Image

    from accflow_tpu.cli.demo import collect_frames

    d = tmp_path / "one"
    d.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "a.png")
    with pytest.raises(SystemExit):
        collect_frames([str(d)])


def test_demo_stream_mode(frame_dir, tmp_path):
    """--mode stream: the stateful per-frame surface writes the same
    F_{i,0} names as long mode (warm-started, reduced iters)."""
    from accflow_tpu.cli.demo import main

    out = str(tmp_path / "out_stream")
    main(["--frames", frame_dir, "--out", out, "--mode", "stream",
          "--stream_iters", "2", "--compute-dtype", "float32"])
    flow = _read(out, "frame_002_to_frame_000.flo")
    assert flow.shape == (36, 44, 2) and np.isfinite(flow).all()


def test_demo_streaming_artifact_mode(frame_dir, tmp_path):
    """--artifact routes streaming artifacts (magic-sniffed) to the
    per-frame surface with no model code."""
    import jax

    from accflow_tpu.cli.demo import main
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.streaming import export_streaming, save_streaming_artifact

    est = build_flow_estimator("raft", compute_dtype="float32", iters=2)
    acfg = AccFlowConfig(compute_dtype="float32", warm_start=True)
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)
    path = str(tmp_path / "stream.sflows")
    init_exp, step_exp = export_streaming(
        est, acfg, ofe_params, acc_params, (1, 40, 48)  # padded 36x44
    )
    save_streaming_artifact(path, init_exp, step_exp)

    out = str(tmp_path / "out_sart")
    main(["--frames", frame_dir, "--out", out, "--artifact", path])
    flow = _read(out, "frame_002_to_frame_000.flo")
    assert flow.shape == (36, 44, 2) and np.isfinite(flow).all()
