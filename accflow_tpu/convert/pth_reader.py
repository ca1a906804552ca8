"""Torch-free .pth reader: load torch-zip checkpoints as numpy arrays.

The released AccFlow checkpoint zoo ({raft,gma}-*.pth, acc+*-*.pth,
reference README.md:21-32) is saved by torch>=1.6's zipfile serializer:
a zip archive holding `<name>/data.pkl` (a pickle whose tensors are
`torch._utils._rebuild_tensor_v2(storage, offset, size, stride, ...)`
calls over persistent-id storages) plus one raw little-endian buffer per
storage under `<name>/data/<key>`. Nothing about that needs torch — this
module parses it with a WHITELISTED Unpickler (only the rebuild helpers
and container types are allowed; anything else raises), so converting or
serving from released checkpoints works on machines without a torch
install, and a malicious pickle cannot execute code through us.

`convert.torch_weights.load_torch_file` uses this reader for zip
checkpoints and falls back to `torch.load` only for the legacy pre-1.6
stream format.
"""

from __future__ import annotations

import pickle
import zipfile
from typing import Dict

import numpy as np


def _np_dtype(storage_name: str):
    table = {
        "FloatStorage": np.float32,
        "DoubleStorage": np.float64,
        "HalfStorage": np.float16,
        "LongStorage": np.int64,
        "IntStorage": np.int32,
        "ShortStorage": np.int16,
        "CharStorage": np.int8,
        "ByteStorage": np.uint8,
        "BoolStorage": np.bool_,
    }
    if storage_name in table:
        return np.dtype(table[storage_name])
    if storage_name == "BFloat16Storage":
        import ml_dtypes  # shipped with jax

        return np.dtype(ml_dtypes.bfloat16)
    raise pickle.UnpicklingError(f"unsupported storage type {storage_name}")


def _rebuild_tensor_v2(storage, offset, size, stride, *_unused):
    """numpy twin of torch._utils._rebuild_tensor_v2: view `storage`
    (a flat array) at element `offset` with `size`/`stride` in elements,
    materialized contiguous. Bounds are validated BEFORE as_strided —
    this reader handles untrusted files and as_strided itself would
    happily read out-of-bounds process memory."""
    size, stride = tuple(size), tuple(stride)
    if len(size) != len(stride):
        raise pickle.UnpicklingError(f"rank mismatch: {size} vs {stride}")
    if offset < 0 or any(s < 0 for s in size) or any(s < 0 for s in stride):
        raise pickle.UnpicklingError(
            f"negative tensor geometry: offset={offset} size={size} "
            f"stride={stride}"
        )
    numel = int(np.prod(size, dtype=np.int64)) if size else 1
    if numel > 0:  # stride 0 (expand) is legal; max index ignores it
        last = offset + sum((d - 1) * st for d, st in zip(size, stride))
        if last >= storage.shape[0]:
            raise pickle.UnpicklingError(
                f"tensor geometry out of bounds: offset={offset} "
                f"size={size} stride={stride} over a {storage.shape[0]}-"
                "element storage"
            )
    itemsize = storage.dtype.itemsize
    view = np.lib.stride_tricks.as_strided(
        storage[offset:],
        shape=size,
        strides=tuple(s * itemsize for s in stride),
    )
    return np.array(view)  # own, contiguous copy


def _rebuild_parameter(data, _requires_grad=True, _hooks=None):
    return data


class _StorageTag(str):
    """find_class stand-in for torch.FloatStorage etc. — only its NAME is
    consulted (inside the persistent-id tuple)."""


class _PthUnpickler(pickle.Unpickler):
    _ALLOWED = {
        ("torch._utils", "_rebuild_tensor_v2"): _rebuild_tensor_v2,
        ("torch._utils", "_rebuild_parameter"): _rebuild_parameter,
    }

    def __init__(self, file, read_record):
        super().__init__(file)
        self._read_record = read_record  # key -> bytes

    def find_class(self, module, name):
        if (module, name) in self._ALLOWED:
            return self._ALLOWED[(module, name)]
        if module in ("torch", "torch.storage") and name.endswith("Storage"):
            return _StorageTag(name)
        if module == "collections" and name == "OrderedDict":
            import collections

            return collections.OrderedDict
        raise pickle.UnpicklingError(
            f"blocked unpickle of {module}.{name} (torch-free .pth reader "
            "allows tensor rebuilds and containers only)"
        )

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_type, key, _location, _numel = pid[1:5]
        dtype = _np_dtype(str(storage_type))
        return np.frombuffer(self._read_record(str(key)), dtype=dtype)


def read_pth_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch-zip .pth file into {key: np.ndarray} without torch.

    Raises ValueError for the legacy (non-zip) stream format — callers
    fall back to torch.load there."""
    if not zipfile.is_zipfile(path):
        raise ValueError(f"{path} is not a torch-zip checkpoint (legacy "
                         "pre-1.6 format needs torch.load)")
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if len(pkl_names) != 1:
            raise ValueError(
                f"{path}: expected one */data.pkl in the archive, found "
                f"{pkl_names}"
            )
        prefix = pkl_names[0][: -len("/data.pkl")]

        def read_record(key: str) -> bytes:
            return zf.read(f"{prefix}/data/{key}")

        with zf.open(pkl_names[0]) as f:
            obj = _PthUnpickler(f, read_record).load()
    return obj
