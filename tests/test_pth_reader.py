"""Torch-free .pth reader (convert/pth_reader.py) vs torch.load.

The released checkpoint zoo is torch-zip serialized; the reader must
reproduce torch.load byte-for-byte on every dtype/layout torch emits,
and must refuse to unpickle anything but tensor rebuilds (it is the
security boundary for untrusted checkpoint files).
"""

import io
import pickle
import zipfile

import numpy as np
import pytest
import torch

from accflow_tpu.convert.pth_reader import read_pth_state_dict


def test_reader_matches_torch_load(tmp_path):
    g = torch.Generator().manual_seed(0)
    base = torch.randn(6, 8, generator=g)
    sd = {
        "w32": torch.randn(4, 3, 5, 5, generator=g),
        "w64": torch.randn(3, 3, generator=g).double(),
        "w16": torch.randn(2, 7, generator=g).half(),
        "bf16": torch.randn(4, 4, generator=g).bfloat16(),
        "i64": torch.arange(12).reshape(3, 4),
        "i32": torch.arange(6, dtype=torch.int32),
        "u8": torch.arange(10, dtype=torch.uint8),
        "flag": torch.tensor([True, False, True]),
        "scalar": torch.tensor(2.5),
        "transposed": base.t(),          # non-contiguous stride
        "sliced": base[1:5:2, ::3],      # offset + strided view
        "shared_a": base,                # two tensors, one storage
        "shared_b": base[2:],
        "expanded": torch.randn(1, 4, generator=g).expand(3, 4),  # stride 0
        "param": torch.nn.Parameter(torch.randn(3, generator=g)),
    }
    path = str(tmp_path / "mixed.pth")
    torch.save(sd, path)

    got = read_pth_state_dict(path)
    want = torch.load(path, map_location="cpu", weights_only=True)
    assert set(got) == set(want)
    for k in want:
        w = want[k].detach().numpy() if k != "bf16" else \
            want[k].detach().float().numpy()
        g_ = np.asarray(got[k]).astype(np.float32) if k == "bf16" else got[k]
        assert g_.shape == tuple(want[k].shape), k
        np.testing.assert_array_equal(np.asarray(g_), w, err_msg=k)

    # nested {"state_dict": ...} wrappers resolve through load_torch_file
    from accflow_tpu.convert.torch_weights import load_torch_file

    wrapped = str(tmp_path / "wrapped.pth")
    torch.save({"state_dict": {"x": torch.ones(2, 2)}}, wrapped)
    out = load_torch_file(wrapped)
    np.testing.assert_array_equal(out["x"], np.ones((2, 2), np.float32))


def test_reader_blocks_arbitrary_classes(tmp_path):
    """A checkpoint whose pickle references a non-whitelisted global must
    be rejected, not executed."""

    class Evil:
        def __reduce__(self):
            import os

            return (os.getcwd, ())  # benign stand-in for os.system

    buf = io.BytesIO()
    pickle.dump({"payload": Evil()}, buf)
    path = str(tmp_path / "evil.pth")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3")
    with pytest.raises(pickle.UnpicklingError, match="blocked"):
        read_pth_state_dict(path)


def test_reader_bounds_checks_geometry(tmp_path):
    """A crafted pickle pointing a huge/negative tensor view at a tiny
    storage must be rejected BEFORE as_strided reads out-of-bounds
    process memory."""

    class Sent:
        pass

    class Pickler(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, Sent):
                # 2-element f32 storage, like torch's ('storage', type,
                # key, location, numel) pid
                return ("storage", torch.FloatStorage, "0", "cpu", 2)
            return None

    def write(path, args):
        class EvilT:
            def __reduce__(self):
                return (torch._utils._rebuild_tensor_v2,
                        (Sent(),) + args + (False, None))

        buf = io.BytesIO()
        Pickler(buf, protocol=2).dump({"t": EvilT()})
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("archive/data.pkl", buf.getvalue())
            zf.writestr("archive/data/0", b"\x00" * 8)  # 2 f32 elements
            zf.writestr("archive/version", "3")

    oob = str(tmp_path / "oob.pth")
    write(oob, (0, (10**6,), (1,)))
    with pytest.raises(pickle.UnpicklingError, match="out of bounds"):
        read_pth_state_dict(oob)

    neg = str(tmp_path / "neg.pth")
    write(neg, (-1, (2,), (1,)))
    with pytest.raises(pickle.UnpicklingError, match="negative"):
        read_pth_state_dict(neg)

    ok = str(tmp_path / "ok.pth")
    write(ok, (1, (1,), (1,)))  # last valid element
    np.testing.assert_array_equal(read_pth_state_dict(ok)["t"],
                                  np.zeros(1, np.float32))


def test_reader_rejects_legacy_format(tmp_path):
    path = str(tmp_path / "legacy.pth")
    with open(path, "wb") as f:
        torch.save({"x": torch.ones(2)}, f, _use_new_zipfile_serialization=False)
    with pytest.raises(ValueError, match="legacy"):
        read_pth_state_dict(path)
    # load_torch_file falls back to torch.load for it
    from accflow_tpu.convert.torch_weights import load_torch_file

    out = load_torch_file(path)
    np.testing.assert_array_equal(out["x"], np.ones(2, np.float32))
