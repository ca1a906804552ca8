"""Data layer tests: CVOR roundtrip, CVO dataset semantics, loaders."""

import numpy as np
import pytest

from accflow_tpu.data import (
    BatchIterator,
    CVORReader,
    decode_flow_u16,
    encode_flow_u16,
    fetch_train_dataset,
    fetch_valid_dataset,
)
from accflow_tpu.data.synthetic import make_clip, write_synthetic_cvor


@pytest.fixture(scope="module")
def cvor_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cvor")
    write_synthetic_cvor(str(root), num_train=5, num_test=3, h=64, w=64)
    return str(root)


def test_flow_codec_roundtrip(rng):
    flow = (rng.standard_normal((8, 8, 2)) * 50).astype(np.float32)
    dec = decode_flow_u16(encode_flow_u16(flow))
    # Storage quantum is 1/128 px (the reference LMDB's own precision).
    np.testing.assert_allclose(dec, flow, atol=1.0 / 256 + 1e-6)


def test_reader_shapes(cvor_root):
    r = CVORReader(cvor_root + "/train")
    assert len(r) == 5
    s = r.sample(0)
    assert s["imgs"].shape == (64, 64, 21) and s["imgs"].dtype == np.float32
    assert s["bflows"].shape == (64, 64, 10)
    assert s["delta_bflows"].shape == (64, 64, 12)


def test_synthetic_flow_consistency(rng):
    """bflows[k] must equal -(k+2)*v where delta flows are v per frame."""
    clip = make_clip(rng, 32, 32)
    v = clip["delta_fflows"][0, 0, :2]
    for k in range(5):
        expected = (k + 2) * v
        np.testing.assert_allclose(clip["fflows"][0, 0, 2 * k : 2 * k + 2], expected)
        np.testing.assert_allclose(clip["bflows"][0, 0, 2 * k : 2 * k + 2], -expected)


def test_train_dataset_crop_and_split(cvor_root):
    dst = fetch_train_dataset(cvor_root, ["bflows"], crop_size=32, split="clean+final")
    assert len(dst) == 10  # clean + final
    s = dst.get(7, np.random.default_rng(0))
    assert s["imgs"].shape == (32, 32, 21)  # blur split renamed to imgs
    assert set(s.keys()) == {"imgs", "bflows"}


def test_valid_dataset_no_crop(cvor_root):
    dst = fetch_valid_dataset(cvor_root, ["fflows", "bflows"], split="clean")
    s = dst.get(0)
    assert s["imgs"].shape == (64, 64, 21)


def test_batch_iterator_determinism(cvor_root):
    dst = fetch_train_dataset(cvor_root, ["bflows"], crop_size=32, split="clean")
    a = list(BatchIterator(dst, 2, shuffle=True, drop_last=True, seed=1, epoch=0))
    b = list(BatchIterator(dst, 2, shuffle=True, drop_last=True, seed=1, epoch=0))
    assert len(a) == len(b) == 2  # 5 samples, batch 2, drop_last
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["imgs"], bb["imgs"])
    c = list(BatchIterator(dst, 2, shuffle=True, drop_last=True, seed=1, epoch=1))
    assert any(
        not np.array_equal(ba["imgs"], bc["imgs"]) for ba, bc in zip(a, c)
    )


def test_invalid_key_rejected(cvor_root):
    with pytest.raises(ValueError):
        fetch_valid_dataset(cvor_root, ["imgs"], split="clean")
