"""LMDB -> CVOR converter parsing logic (cli/convert_data.py), exercised
WITHOUT lmdb/pyarrow installed: the env/txn and pa.deserialize are stubbed
so a typo in the key scheme ("{:05d}_{key}", "__samples__" — reference
data/dataset.py:45,62-67) or payload handling surfaces here instead of on
the one machine holding the irreplaceable original data."""

import sys
import types

import numpy as np
import pytest


def _make_fake_modules(store):
    """Fake `lmdb` + `pyarrow` modules over an in-memory {bytes: value}
    store; 'deserialization' is identity (values are already arrays)."""

    class FakeTxn:
        def get(self, key):
            return store[key]

    class FakeEnv:
        def begin(self, write=False):
            txn = FakeTxn()

            class Ctx:
                def __enter__(self_):
                    return txn

                def __exit__(self_, *a):
                    return False

            return Ctx()

    fake_lmdb = types.ModuleType("lmdb")
    fake_lmdb.open = lambda *a, **k: FakeEnv()
    fake_pa = types.ModuleType("pyarrow")
    fake_pa.deserialize = lambda blob: blob
    return fake_lmdb, fake_pa


@pytest.fixture()
def fake_lmdb_store(monkeypatch):
    from accflow_tpu.data.records import ALL_KEYS, encode_flow_u16

    rng = np.random.default_rng(0)
    n, h, w = 3, 16, 16
    store = {b"__samples__": [f"{i:05d}" for i in range(n)]}
    truth = []
    for i in range(n):
        sample = {}
        for k in ALL_KEYS:
            if "flow" in k:
                flow = rng.uniform(-50, 50, (h, w, 10)).astype(np.float32)
                raw = encode_flow_u16(flow)
                sample[k] = raw  # uint16 payload, as stored upstream
            else:
                sample[k] = rng.integers(0, 255, (h, w, 21), dtype=np.uint8)
            store[f"{i:05d}_{k}".encode()] = sample[k]
        truth.append(sample)

    fake_lmdb, fake_pa = _make_fake_modules(store)
    monkeypatch.setitem(sys.modules, "lmdb", fake_lmdb)
    monkeypatch.setitem(sys.modules, "pyarrow", fake_pa)
    return store, truth


def test_convert_lmdb_to_cvor(tmp_path, fake_lmdb_store):
    from accflow_tpu.cli.convert_data import convert
    from accflow_tpu.data.records import ALL_KEYS, CVORReader

    _, truth = fake_lmdb_store
    out = str(tmp_path / "cvor_out")
    n = convert("fake.lmdb", out, limit=None)
    assert n == 3

    rd = CVORReader(out)
    assert len(rd) == 3
    for i in range(3):
        for k in ALL_KEYS:
            np.testing.assert_array_equal(
                rd.raw(i, k), truth[i][k],
                err_msg=f"bit-exact payload copy for sample {i} key {k}",
            )


def test_convert_limit(tmp_path, fake_lmdb_store):
    from accflow_tpu.cli.convert_data import convert
    from accflow_tpu.data.records import CVORReader

    out = str(tmp_path / "cvor_lim")
    assert convert("fake.lmdb", out, limit=2) == 2
    assert len(CVORReader(out)) == 2
