"""RAFT/GMA feature and context encoders (NHWC, functional).

Rebuilt from the behavior of networks/raft/extractor.py:
- ResidualBlock (:5-63), BottleneckBlock (:66-134),
- BasicEncoder (:137-225): 7x7/2 stem + 3 residual stages (64, 96, 128),
  1x1 output conv, total stride 8,
- SmallEncoder (:228-306): bottleneck variant (32, 64, 96).

Param-tree paths mirror the torch module names (conv1, norm1, layer1.0.conv2,
downsample.0/1, conv2, ...) so .pth conversion is mechanical. Note the
reference registers the downsample norm both as `norm3` and `downsample.1`
(shared tensor); we store it only under `downsample.1`.

The GMA copy of BasicEncoder (networks/gma/extractor.py:116-188) is the same
computation with input_dim fixed to 3 — covered by `input_dim=3` here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from accflow_tpu.nn.layers import (
    apply_norm,
    conv2d,
    init_conv,
    init_norm,
    relu,
)

Params = dict


def _norm_groups(planes: int) -> int:
    return planes // 8


def _s2d_stem_conv(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """The 7x7/stride-2 stem conv, reformulated as a 4x4/stride-1 conv on a
    2x2 space-to-depth transform of the input (exact up to summation order).

    The stem is the worst conv on the MXU: 3 input channels out of 128
    lanes (traced at 10-12 TF/s, 5-6% of bf16 peak). Folding 2x2 pixel
    blocks into channels quarters the window count and quadruples the
    contraction depth (3 -> 12): out[y'] = sum_dy w[dy] x[2y'+dy-3] becomes
    a 4-tap valid conv over blocks S[Y, py] = xq[2Y+py] with xq = x padded
    (4, 2) and weights wp[2DY+py] = w[2DY+py-1] (tap -1 zero-padded).
    """
    w = p["w"]
    cin, cout = w.shape[2], w.shape[3]
    n, h, wd, _ = x.shape
    # The folded-weight construction below is specific to the 7x7/pad-3
    # geometry; fall back for any other stem kernel or odd input sizes
    # (InputPadder guarantees even sizes on the protocol path).
    if w.shape[:2] != (7, 7) or h % 2 or wd % 2:
        return conv2d(p, x, stride=2)
    xq = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
    hq, wq = h + 6, wd + 6
    s = (
        xq.reshape(n, hq // 2, 2, wq // 2, 2, cin)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(n, hq // 2, wq // 2, 4 * cin)
    )
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = (
        wp.reshape(4, 2, 4, 2, cin, cout)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 4 * cin, cout)
    )
    p2 = {"w": w2}
    if "b" in p:
        p2["b"] = p["b"]
    return conv2d(p2, s, padding=0)


def _stem(p: Params, x: jnp.ndarray, s2d: bool) -> jnp.ndarray:
    return _s2d_stem_conv(p, x) if s2d else conv2d(p, x, stride=2)


# ---------------------------------------------------------------------------
# Residual block
# ---------------------------------------------------------------------------

def init_residual_block(
    key: jax.Array, in_planes: int, planes: int, norm_fn: str, stride: int = 1
) -> Params:
    ks = jax.random.split(key, 3)
    p: Params = {
        "conv1": init_conv(ks[0], in_planes, planes, 3, init="kaiming_normal_out"),
        "conv2": init_conv(ks[1], planes, planes, 3, init="kaiming_normal_out"),
    }
    for name in ("norm1", "norm2"):
        norm_p = init_norm(norm_fn, planes, _norm_groups(planes))
        if norm_p is not None:
            p[name] = norm_p
    if stride != 1 or in_planes != planes:
        down: Params = {
            "0": init_conv(ks[2], in_planes, planes, 1, init="kaiming_normal_out")
        }
        norm_p = init_norm(norm_fn, planes, _norm_groups(planes))
        if norm_p is not None:
            down["1"] = norm_p
        p["downsample"] = down
    return p


def residual_block(
    p: Params, x: jnp.ndarray, norm_fn: str, stride: int = 1, train: bool = False
) -> jnp.ndarray:
    planes = p["conv1"]["w"].shape[-1]
    groups = _norm_groups(planes)
    y = relu(apply_norm(norm_fn, p.get("norm1"), conv2d(p["conv1"], x, stride=stride), groups, train))
    y = relu(apply_norm(norm_fn, p.get("norm2"), conv2d(p["conv2"], y), groups, train))
    if "downsample" in p:
        x = apply_norm(
            norm_fn,
            p["downsample"].get("1"),
            conv2d(p["downsample"]["0"], x, stride=stride, padding=0),
            groups,
            train,
        )
    return relu(x + y)


# ---------------------------------------------------------------------------
# Bottleneck block (small models)
# ---------------------------------------------------------------------------

def init_bottleneck_block(
    key: jax.Array, in_planes: int, planes: int, norm_fn: str, stride: int = 1
) -> Params:
    ks = jax.random.split(key, 4)
    p: Params = {
        "conv1": init_conv(ks[0], in_planes, planes // 4, 1, init="kaiming_normal_out"),
        "conv2": init_conv(ks[1], planes // 4, planes // 4, 3, init="kaiming_normal_out"),
        "conv3": init_conv(ks[2], planes // 4, planes, 1, init="kaiming_normal_out"),
    }
    groups = _norm_groups(planes)
    for name, ch in (("norm1", planes // 4), ("norm2", planes // 4), ("norm3", planes)):
        norm_p = init_norm(norm_fn, ch, groups)
        if norm_p is not None:
            p[name] = norm_p
    if stride != 1:
        down: Params = {
            "0": init_conv(ks[3], in_planes, planes, 1, init="kaiming_normal_out")
        }
        norm_p = init_norm(norm_fn, planes, groups)
        if norm_p is not None:
            down["1"] = norm_p
        p["downsample"] = down
    return p


def bottleneck_block(
    p: Params, x: jnp.ndarray, norm_fn: str, stride: int = 1, train: bool = False
) -> jnp.ndarray:
    planes = p["conv3"]["w"].shape[-1]
    groups = _norm_groups(planes)
    y = relu(apply_norm(norm_fn, p.get("norm1"), conv2d(p["conv1"], x, padding=0), groups, train))
    y = relu(apply_norm(norm_fn, p.get("norm2"), conv2d(p["conv2"], y, stride=stride), groups, train))
    y = relu(apply_norm(norm_fn, p.get("norm3"), conv2d(p["conv3"], y, padding=0), groups, train))
    if "downsample" in p:
        x = apply_norm(
            norm_fn,
            p["downsample"].get("1"),
            conv2d(p["downsample"]["0"], x, stride=stride, padding=0),
            groups,
            train,
        )
    return relu(x + y)


# ---------------------------------------------------------------------------
# BasicEncoder
# ---------------------------------------------------------------------------

_BASIC_STAGES = (64, 96, 128)


def init_basic_encoder(
    key: jax.Array, input_dim: int = 3, output_dim: int = 128, norm_fn: str = "batch"
) -> Params:
    ks = jax.random.split(key, 8)
    p: Params = {"conv1": init_conv(ks[0], input_dim, 64, 7, init="kaiming_normal_out")}
    norm_p = init_norm(norm_fn, 64, 8)
    if norm_p is not None:
        p["norm1"] = norm_p
    in_planes = 64
    for idx, (planes, stride) in enumerate(zip(_BASIC_STAGES, (1, 2, 2)), start=1):
        p[f"layer{idx}"] = {
            "0": init_residual_block(ks[2 * idx - 1], in_planes, planes, norm_fn, stride),
            "1": init_residual_block(ks[2 * idx], planes, planes, norm_fn, 1),
        }
        in_planes = planes
    p["conv2"] = init_conv(ks[7], 128, output_dim, 1, init="kaiming_normal_out")
    return p


def basic_encoder(
    p: Params, x: jnp.ndarray, norm_fn: str, train: bool = False,
    stem_s2d: bool = False,
) -> jnp.ndarray:
    """Stride-8 feature encoder. x: (N, H, W, C) -> (N, H/8, W/8, output_dim).

    train=True switches BatchNorm layers to batch statistics and stashes
    running-stat updates (see nn/layers.py::batch_norm)."""
    x = _stem(p["conv1"], x, stem_s2d)
    x = relu(apply_norm(norm_fn, p.get("norm1"), x, 8, train))
    for idx, stride in zip((1, 2, 3), (1, 2, 2)):
        stage = p[f"layer{idx}"]
        x = residual_block(stage["0"], x, norm_fn, stride, train)
        x = residual_block(stage["1"], x, norm_fn, 1, train)
    return conv2d(p["conv2"], x, padding=0)


# ---------------------------------------------------------------------------
# SmallEncoder
# ---------------------------------------------------------------------------

_SMALL_STAGES = (32, 64, 96)


def init_small_encoder(
    key: jax.Array, output_dim: int = 128, norm_fn: str = "batch"
) -> Params:
    ks = jax.random.split(key, 8)
    p: Params = {"conv1": init_conv(ks[0], 3, 32, 7, init="kaiming_normal_out")}
    norm_p = init_norm(norm_fn, 32, 8)
    if norm_p is not None:
        p["norm1"] = norm_p
    in_planes = 32
    for idx, (planes, stride) in enumerate(zip(_SMALL_STAGES, (1, 2, 2)), start=1):
        p[f"layer{idx}"] = {
            "0": init_bottleneck_block(ks[2 * idx - 1], in_planes, planes, norm_fn, stride),
            "1": init_bottleneck_block(ks[2 * idx], planes, planes, norm_fn, 1),
        }
        in_planes = planes
    p["conv2"] = init_conv(ks[7], 96, output_dim, 1, init="kaiming_normal_out")
    return p


def small_encoder(
    p: Params, x: jnp.ndarray, norm_fn: str, train: bool = False,
    stem_s2d: bool = False,
) -> jnp.ndarray:
    x = _stem(p["conv1"], x, stem_s2d)
    x = relu(apply_norm(norm_fn, p.get("norm1"), x, 8, train))
    for idx, stride in zip((1, 2, 3), (1, 2, 2)):
        stage = p[f"layer{idx}"]
        x = bottleneck_block(stage["0"], x, norm_fn, stride, train)
        x = bottleneck_block(stage["1"], x, norm_fn, 1, train)
    return conv2d(p["conv2"], x, padding=0)
