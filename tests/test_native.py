"""Native C++ data-path core: build, ABI, and numerical equivalence with
the numpy fallback."""

import numpy as np
import pytest

from accflow_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of cvor_core failed"


def test_decode_flow_matches_numpy(rng):
    raw = rng.integers(0, 65535, size=(4, 8, 8, 2), dtype=np.uint16)
    ours = native.decode_flow_u16(raw)
    ref = (raw.astype(np.float32) - 32768.0) / 128.0
    np.testing.assert_array_equal(ours, ref)


def test_normalize_u8_matches_numpy(rng):
    raw = rng.integers(0, 255, size=(3, 5, 7, 3), dtype=np.uint8)
    ours = native.normalize_u8(raw)
    ref = 2.0 * (raw.astype(np.float32) / 255.0) - 1.0
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_gather_crop_matches_numpy(rng):
    col = rng.integers(0, 255, size=(6, 16, 16, 3), dtype=np.uint8)
    idx = np.array([4, 0, 2], np.int64)
    y0 = np.array([1, 0, 7], np.int32)
    x0 = np.array([3, 8, 0], np.int32)
    out = native.gather_crop(col, idx, y0, x0, (8, 8))
    ref = np.stack([col[i, y : y + 8, x : x + 8] for i, y, x in zip(idx, y0, x0)])
    np.testing.assert_array_equal(out, ref)


def test_gather_crop_decode_flow(rng):
    col = rng.integers(0, 65535, size=(4, 12, 12, 10), dtype=np.uint16)
    idx = np.array([1, 3], np.int64)
    y0 = np.array([2, 0], np.int32)
    x0 = np.array([0, 4], np.int32)
    out = native.gather_crop(col, idx, y0, x0, (8, 8), decode_flow=True)
    ref = np.stack([col[i, y : y + 8, x : x + 8] for i, y, x in zip(idx, y0, x0)])
    ref = (ref.astype(np.float32) - 32768.0) / 128.0
    np.testing.assert_array_equal(out, ref)
