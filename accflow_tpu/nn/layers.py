"""Minimal functional NN layer library (NHWC, params as nested dicts).

Design: every layer is a pair of pure functions — an `init_*` that returns a
params dict and an apply function taking (params, x). Parameter trees mirror
the reference's torch module structure (same nesting, `w`/`b` in place of
`weight`/`bias`, HWIO conv layout), which makes .pth checkpoint conversion a
mechanical per-leaf transform (see accflow_tpu/convert/torch_weights.py).

Initializers reproduce torch defaults so training-from-scratch matches the
reference's statistics:
- conv weight: kaiming_uniform(a=sqrt(5)) == U(-sqrt(1/fan_in), +sqrt(1/fan_in))
- conv bias:   U(-1/sqrt(fan_in), +1/sqrt(fan_in))
- encoders override weights with kaiming_normal(fan_out, relu)
  (networks/raft/extractor.py:178-188) — biases keep the default init.

Norms (networks/raft/extractor.py:20-45):
- instance: nn.InstanceNorm2d default — no affine params, eps=1e-5,
  per-sample-per-channel stats (identical in train and eval).
- batch: nn.BatchNorm2d — affine, running stats; we apply *frozen* (eval)
  semantics, the only mode exercised by released checkpoints at eval time.
- none: identity.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Params = dict

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# Conv2D
# ---------------------------------------------------------------------------

def init_conv(
    key: jax.Array,
    cin: int,
    cout: int,
    ksize,
    bias: bool = True,
    init: str = "torch",
) -> Params:
    """Create conv params {w: (kh, kw, cin, cout)[, b: (cout,)]}.

    init: "torch" (kaiming_uniform a=sqrt(5)), "kaiming_normal_out" (relu),
    or "zeros".
    """
    if isinstance(ksize, int):
        ksize = (ksize, ksize)
    kh, kw = ksize
    fan_in = cin * kh * kw
    fan_out = cout * kh * kw
    kw_key, kb_key = jax.random.split(key)

    if init == "torch":
        bound = math.sqrt(1.0 / fan_in)
        w = jax.random.uniform(kw_key, (kh, kw, cin, cout), jnp.float32, -bound, bound)
    elif init == "kaiming_normal_out":
        std = math.sqrt(2.0 / fan_out)
        w = std * jax.random.normal(kw_key, (kh, kw, cin, cout), jnp.float32)
    elif init == "zeros":
        w = jnp.zeros((kh, kw, cin, cout), jnp.float32)
    else:
        raise ValueError(init)

    p: Params = {"w": w}
    if bias:
        if init == "zeros":
            p["b"] = jnp.zeros((cout,), jnp.float32)
        else:
            b_bound = math.sqrt(1.0 / fan_in)
            p["b"] = jax.random.uniform(kb_key, (cout,), jnp.float32, -b_bound, b_bound)
    return p


def conv2d(
    p: Params,
    x: jnp.ndarray,
    stride: int = 1,
    padding=None,
    dilation: int = 1,
) -> jnp.ndarray:
    """NHWC conv. padding defaults to 'same-for-odd-kernels' torch style
    ((k-1)//2 per side); pass an int or ((ph, ph), (pw, pw)) to override."""
    w = p["w"].astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    if padding is None:
        padding = ((kh - 1) // 2, (kw - 1) // 2)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMNUMS,
    )
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-(sample, channel) normalization over H, W; no affine (torch
    InstanceNorm2d defaults). Stats in float32 for bf16 inputs.

    float32 inputs take the exact two-pass torch-parity path. For bf16
    inputs the f32 materialization of the activations is the cost (XLA
    keeps the shared cast as a real f32 buffer plus bf16<->f32 tile
    relayout copies — ~13% of the streaming serving step, trace r4), so
    the stats use convert-fused f32 reductions (one-pass var) and the
    normalize stays in bf16 arithmetic: 3x faster on the dominant
    256^2x64 encoder stage (scripts/micro_inorm.py; 4.68 -> 1.55 ms per
    conv-norm-relu chain), output drift within bf16 rounding
    (tests/test_ops_golden.py::test_instance_norm_bf16_close_to_f32)."""
    if x.dtype == jnp.float32:
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * lax.rsqrt(var + eps)
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    meansq = jnp.mean(
        jnp.square(x.astype(jnp.float32)),
        axis=(1, 2), keepdims=True, dtype=jnp.float32,
    )
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    scale = lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * scale.astype(x.dtype)


def init_batch_norm(num_features: int) -> Params:
    return {
        "scale": jnp.ones((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
    }


def batch_norm(
    p: Params,
    x: jnp.ndarray,
    eps: float = 1e-5,
    train: bool = False,
    momentum: float = 0.1,
) -> jnp.ndarray:
    """BatchNorm2d (nn.BatchNorm2d semantics, NHWC).

    train=False: frozen eval mode — normalize with the running statistics.

    train=True: normalize with the current batch's (biased) statistics over
    (N, H, W) and stash EMA-updated running stats (torch momentum=0.1
    update; running var uses the UNBIASED batch variance) into the param
    dict under "new_mean"/"new_var". A training step harvests these with
    `collect_bn_updates(params)` INSIDE the same trace (e.g. as a loss-fn
    aux output) and merges them back with `apply_bn_updates`. Under pjit
    the mean/var reductions see the GLOBAL batch, so SPMD data-parallel
    training computes the same statistics as a single device — GSPMD
    inserts the cross-device reductions (reference:
    /root/reference/fine_tune.py:163 trains with model.train() BN).
    """
    if train:
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=(0, 1, 2))
        var = xf.var(axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        p["new_mean"] = (1.0 - momentum) * p["mean"] + momentum * mean
        p["new_var"] = (1.0 - momentum) * p["var"] + momentum * unbiased
        scale_f = p["scale"] * lax.rsqrt(var + eps)
        bias_f = p["bias"] - mean * scale_f
        return (xf * scale_f + bias_f).astype(x.dtype)
    scale = (p["scale"] * lax.rsqrt(p["var"] + eps)).astype(x.dtype)
    bias = (p["bias"] - p["mean"] * p["scale"] * lax.rsqrt(p["var"] + eps)).astype(
        x.dtype
    )
    return x * scale + bias


def _is_bn_params(d) -> bool:
    return isinstance(d, dict) and "mean" in d and "var" in d and "scale" in d


def collect_bn_updates(params: Params) -> dict:
    """Pop the "new_mean"/"new_var" stashes left by train-mode batch_norm
    out of a (traced) param tree. Returns a nested dict mirroring the
    tree's structure with {"mean", "var"} leaves — suitable as a loss-fn
    aux output. Must run inside the same trace as the forward."""
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            if "new_mean" in v:
                out[k] = {"mean": v.pop("new_mean"), "var": v.pop("new_var")}
            else:
                sub = collect_bn_updates(v)
                if sub:
                    out[k] = sub
    return out


def apply_bn_updates(params: Params, updates: dict) -> Params:
    """Merge a collect_bn_updates tree back into a param tree (pure)."""
    new = dict(params)
    for k, v in updates.items():
        if set(v.keys()) == {"mean", "var"} and not isinstance(v["mean"], dict):
            new[k] = {**params[k], "mean": v["mean"], "var": v["var"]}
        else:
            new[k] = apply_bn_updates(params[k], v)
    return new


def bn_buffer_mask(params: Params, trainable: bool = True):
    """Pytree of bools over `params`: True for trainable leaves, False for
    BatchNorm running-stat buffers (mean/var). torch registers those as
    buffers, NOT parameters (`nn.BatchNorm2d`), so the reference's
    AdamW never touches them — pass this to optax.masked so weight decay
    cannot shrink the running statistics."""
    def rec(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = rec(v)
            elif _is_bn_params(d) and k in ("mean", "var"):
                out[k] = not trainable
            else:
                out[k] = trainable
        return out

    return rec(params)


def init_group_norm(num_features: int) -> Params:
    return {
        "scale": jnp.ones((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
    }


def group_norm(p: Params, x: jnp.ndarray, num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h, w, num_groups, c // num_groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf.reshape(n, h, w, c)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def apply_norm(
    norm_fn: str,
    p: Optional[Params],
    x: jnp.ndarray,
    num_groups: int = 8,
    train: bool = False,
):
    """`train` only affects batch norm (instance/group norms behave
    identically in torch train and eval modes; dropout is 0 in every
    released config)."""
    if norm_fn == "instance":
        return instance_norm(x)
    if norm_fn == "batch":
        return batch_norm(p, x, train=train)
    if norm_fn == "group":
        return group_norm(p, x, num_groups)
    if norm_fn == "none":
        return x
    raise ValueError(norm_fn)


def init_norm(norm_fn: str, num_features: int, num_groups: int = 8) -> Optional[Params]:
    if norm_fn == "batch":
        return init_batch_norm(num_features)
    if norm_fn == "group":
        return init_group_norm(num_features)
    return None  # instance (no affine) and none carry no params


# ---------------------------------------------------------------------------
# ZeroConv2d (networks/modules.py:81-97)
# ---------------------------------------------------------------------------

def init_zero_conv(key: jax.Array, cin: int, cout: int) -> Params:
    p = init_conv(key, cin, cout, 3, init="zeros")
    p["scale"] = jnp.zeros((cout,), jnp.float32)
    return p


def zero_conv2d(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    out = conv2d({"w": p["w"], "b": p["b"]}, x)
    return out * jnp.exp(p["scale"].astype(out.dtype) * 3.0)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(x)
