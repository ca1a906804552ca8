"""Convert reference PyTorch checkpoints (.pth) to accflow_tpu param trees.

The released zoo (reference README.md:21-32) is 8 files:
{raft,gma}-{things,cvo}.pth and acc+{raft,gma}-{things,cvo}.pth. RAFT/GMA
checkpoints carry nn.DataParallel "module." prefixes (stripped, mirroring
train_acc.py:159-161); AccFlow checkpoints additionally contain the frozen
OFE under "module.ofe.*" (test_cvo.py:17-19 loads both at once).

Because accflow_tpu param trees mirror the torch module structure (same
nesting, "w"/"b" in place of "weight"/"bias"), conversion is a mechanical
per-leaf lookup + layout transform:

- conv weight  (O, I, kh, kw) -> (kh, kw, I, O)
- norm weight/bias/running_mean/running_var -> scale/bias/mean/var, as-is
- ZeroConv2d   {conv.weight, conv.bias, scale(1,C,1,1)} -> {w, b, scale(C,)}
- Aggregate.gamma (1,) -> gamma (1,)

Every tensor consumed is tracked; leftover torch keys (beyond
num_batches_tracked) raise, so silent partial conversions can't happen.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

Params = Dict[str, Any]


def strip_module_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    return {k.removeprefix("module."): v for k, v in state_dict.items()}


def split_accflow_state(state_dict: Mapping[str, Any]):
    """Split an AccFlow checkpoint into (ofe_state, acc_state)."""
    ofe = {}
    acc = {}
    for k, v in state_dict.items():
        if k.startswith("ofe."):
            ofe[k[len("ofe.") :]] = v
        else:
            acc[k] = v
    return ofe, acc


def _to_numpy(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    # Always copy: torch's .numpy() SHARES memory with the tensor, and
    # jnp.asarray on the CPU backend can zero-copy aligned float buffers —
    # without this, converted params would alias live torch storage and a
    # later in-place torch op (e.g. a train-mode BN running-stat update)
    # would silently corrupt them.
    return np.array(v, copy=True)


def _is_zero_conv(subtree: Mapping[str, Any]) -> bool:
    return set(subtree.keys()) == {"w", "b", "scale"}


def convert_state_dict(template: Params, state_dict: Mapping[str, Any]) -> Params:
    """Fill `template` (an init_* param tree) from a torch state_dict."""
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    used: set[str] = set()

    def fetch(key: str) -> np.ndarray:
        if key not in sd:
            raise KeyError(f"missing torch key: {key}")
        used.add(key)
        return sd[key]

    def convert(subtree, prefix: str):
        if not isinstance(subtree, dict):
            raise TypeError(f"unexpected leaf at {prefix}")
        if _is_zero_conv(subtree):
            w = fetch(f"{prefix}.conv.weight")
            b = fetch(f"{prefix}.conv.bias")
            s = fetch(f"{prefix}.scale")
            return {
                "w": jnp.asarray(w.transpose(2, 3, 1, 0)),
                "b": jnp.asarray(b),
                "scale": jnp.asarray(s.reshape(-1)),
            }
        out = {}
        for name, child in subtree.items():
            path = f"{prefix}.{name}" if prefix else name
            if isinstance(child, dict):
                out[name] = convert(child, path)
                continue
            base = prefix if prefix else ""
            if name == "w":
                t = fetch(f"{base}.weight" if base else "weight")
                if t.ndim != 4:
                    raise ValueError(f"conv weight expected 4D at {base}, got {t.shape}")
                out[name] = jnp.asarray(t.transpose(2, 3, 1, 0))
            elif name == "b":
                out[name] = jnp.asarray(fetch(f"{base}.bias"))
            elif name == "emb":
                t = fetch(f"{base}.weight")
                if t.ndim != 2:
                    raise ValueError(f"embedding expected 2D at {base}, got {t.shape}")
                out[name] = jnp.asarray(t)
            elif name == "scale":
                out[name] = jnp.asarray(fetch(f"{base}.weight"))
            elif name == "bias":
                out[name] = jnp.asarray(fetch(f"{base}.bias"))
            elif name == "mean":
                out[name] = jnp.asarray(fetch(f"{base}.running_mean"))
            elif name == "var":
                out[name] = jnp.asarray(fetch(f"{base}.running_var"))
            elif name == "gamma":
                out[name] = jnp.asarray(fetch(f"{base}.gamma" if base else "gamma"))
            else:
                raise KeyError(f"unhandled leaf {name} at {base}")
            if out[name].shape != child.shape:
                raise ValueError(
                    f"shape mismatch at {path}: template {child.shape} "
                    f"vs converted {out[name].shape}"
                )
        return out

    converted = convert(template, "")

    # The reference registers the downsample norm twice: as `norm3`
    # (ResidualBlock, extractor.py:26-27) / `norm4` (BottleneckBlock) AND
    # inside `downsample.1` (same tensors). We consume the downsample copy;
    # drop the alias keys here.
    for key in list(sd):
        stem, _, leaf = key.rpartition(".")
        prefix, _, norm_name = stem.rpartition(".")
        if norm_name in ("norm3", "norm4"):
            twin = f"{prefix}.downsample.1.{leaf}" if prefix else f"downsample.1.{leaf}"
            if twin in used:
                used.add(key)

    leftovers = {
        k
        for k in sd
        if k not in used
        and not k.endswith("num_batches_tracked")
        # RelPosEmb registers its (deterministic) relative-index matrix as a
        # buffer (networks/gma/modules.py:16-18); it carries no weights.
        and not k.endswith("rel_ind")
    }
    if leftovers:
        raise ValueError(f"unconsumed torch keys: {sorted(leftovers)[:10]} ...")
    return converted


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state_dict as numpy.

    torch-zip checkpoints (torch>=1.6 — all released AccFlow files) are
    read TORCH-FREE via convert.pth_reader (whitelisted unpickler); only
    the legacy pre-1.6 stream format falls back to torch.load, so torch
    is not required to convert or serve from the released zoo."""
    import zipfile

    if zipfile.is_zipfile(path):
        from accflow_tpu.convert.pth_reader import read_pth_state_dict

        sd = read_pth_state_dict(path)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return {k: np.asarray(v) for k, v in sd.items()}

    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _to_numpy(v) for k, v in sd.items()}


def _load_npz_tree(path: str, template: Params, what: str) -> Params:
    """Load a convert.store .npz param tree, validated against `template`
    (same leaf paths and shapes — a clear error beats a deep shape
    mismatch later)."""
    from accflow_tpu.convert.store import _flatten, load_params

    loaded = load_params(path)
    lf, tf = _flatten(loaded), _flatten(template)
    if set(lf) != set(tf):
        missing = sorted(set(tf) - set(lf))[:5]
        extra = sorted(set(lf) - set(tf))[:5]
        raise ValueError(
            f"{path} does not match the {what} param tree "
            f"(missing {missing}, unexpected {extra})"
        )
    for k in tf:
        if tuple(lf[k].shape) != tuple(np.asarray(tf[k]).shape):
            raise ValueError(
                f"{path}: {what} leaf {k} has shape {tuple(lf[k].shape)}, "
                f"expected {tuple(np.asarray(tf[k]).shape)}"
            )
    return loaded


def load_flow_estimator_checkpoint(path: str, template: Params) -> Params:
    """Load a raft-*/gma-* checkpoint into an estimator param tree:
    a torch .pth (converted on the fly) or a cli.convert_ckpt .npz."""
    if path.endswith(".npz"):
        return _load_npz_tree(path, template, "estimator")
    sd = strip_module_prefix(load_torch_file(path))
    return convert_state_dict(template, sd)


def load_accflow_checkpoint(path: str, acc_template: Params, ofe_template: Params):
    """Load an acc+{raft,gma}-* checkpoint: a torch .pth (converted on
    the fly), or the cli.convert_ckpt .npz pair — pass the stem, or
    either of <stem>.acc.npz / <stem>.ofe.npz.

    Returns (acc_params, ofe_params)."""
    import os.path as _osp

    if path.endswith(".npz") or not _osp.exists(path):
        stem = path
        for suffix in (".acc.npz", ".ofe.npz", ".npz"):
            stem = stem.removesuffix(suffix)
        acc_path, ofe_path = stem + ".acc.npz", stem + ".ofe.npz"
        if _osp.exists(acc_path) and _osp.exists(ofe_path):
            return (
                _load_npz_tree(acc_path, acc_template, "accumulator"),
                _load_npz_tree(ofe_path, ofe_template, "estimator"),
            )
        if path.endswith(".npz") or not _osp.exists(path):
            raise FileNotFoundError(
                f"acc checkpoint {path!r} not found — expected a torch "
                f".pth file or the cli.convert_ckpt .npz pair "
                f"({acc_path} + {ofe_path})"
            )
    sd = strip_module_prefix(load_torch_file(path))
    ofe_sd, acc_sd = split_accflow_state(sd)
    return convert_state_dict(acc_template, acc_sd), convert_state_dict(
        ofe_template, ofe_sd
    )
