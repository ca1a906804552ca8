"""Golden-value tests: accflow_tpu ops vs PyTorch reference semantics.

Each test builds the torch computation inline (mirroring the reference's
op-level behavior) and checks our NHWC JAX op against it. Torch runs on CPU.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from accflow_tpu import ops


def nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x_nhwc, -1, 1)))


def to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


# ---------------------------------------------------------------------------
# bilinear_sample vs grid_sample(align_corners=True, padding_mode="zeros")
# ---------------------------------------------------------------------------

def test_bilinear_sample_matches_grid_sample(rng):
    b, h, w, c = 2, 13, 17, 3
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    # Coords spanning in-bounds, sub-pixel, and out-of-bounds regions.
    coords = rng.uniform(-3.0, max(h, w) + 2.0, size=(b, 9, 11, 2)).astype(np.float32)

    ours = np.asarray(ops.bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))

    # Torch: normalize pixel coords like the reference bilinear_sampler.
    t_img = nchw(img)
    xg = torch.from_numpy(coords[..., 0]) * 2.0 / (w - 1) - 1.0
    yg = torch.from_numpy(coords[..., 1]) * 2.0 / (h - 1) - 1.0
    grid = torch.stack([xg, yg], dim=-1)
    ref = F.grid_sample(t_img, grid, align_corners=True, padding_mode="zeros")
    ref = to_nhwc(ref)

    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_backwarp_matches_reference(rng):
    b, h, w, c = 2, 16, 24, 4
    img = rng.standard_normal((b, h, w, c)).astype(np.float32)
    flow = (5.0 * rng.standard_normal((b, h, w, 2))).astype(np.float32)

    ours = np.asarray(ops.backwarp(jnp.asarray(img), jnp.asarray(flow)))

    # Reference backwarp: grid + flow, (W-1) normalization, zeros padding.
    t_img, t_flow = nchw(img), nchw(flow)
    xx = torch.arange(0, w).view(1, -1).repeat(h, 1)
    yy = torch.arange(0, h).view(-1, 1).repeat(1, w)
    grid = torch.cat(
        [xx.view(1, 1, h, w).repeat(b, 1, 1, 1), yy.view(1, 1, h, w).repeat(b, 1, 1, 1)],
        1,
    ).float()
    vgrid = grid + t_flow
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(w - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(h - 1, 1) - 1.0
    ref = F.grid_sample(
        t_img, vgrid.permute(0, 2, 3, 1), mode="bilinear",
        padding_mode="zeros", align_corners=True,
    )
    np.testing.assert_allclose(ours, to_nhwc(ref), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Resize / upflow / downflow
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scale", ["up", "down"])
def test_flow_resize_matches_interpolate(rng, scale):
    b = 2
    if scale == "up":
        h, w = 8, 12
        flow = rng.standard_normal((b, h, w, 2)).astype(np.float32)
        ours = np.asarray(ops.upflow8(jnp.asarray(flow)))
        ref = 8 * F.interpolate(
            nchw(flow), size=(8 * h, 8 * w), mode="bilinear", align_corners=True
        )
    else:
        h, w = 64, 96
        flow = rng.standard_normal((b, h, w, 2)).astype(np.float32)
        ours = np.asarray(ops.downflow8(jnp.asarray(flow)))
        ref = (
            F.interpolate(
                nchw(flow), size=(h // 8, w // 8), mode="bilinear", align_corners=True
            )
            / 8
        )
    np.testing.assert_allclose(ours, to_nhwc(ref), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Convex upsample (RAFT upsample_flow)
# ---------------------------------------------------------------------------

def torch_upsample_flow(flow, mask):
    n, _, h, w = flow.shape
    mask = mask.view(n, 1, 9, 8, 8, h, w)
    mask = torch.softmax(mask, dim=2)
    up_flow = F.unfold(8 * flow, [3, 3], padding=1)
    up_flow = up_flow.view(n, 2, 9, 1, 1, h, w)
    up_flow = torch.sum(mask * up_flow, dim=2)
    up_flow = up_flow.permute(0, 1, 4, 2, 5, 3)
    return up_flow.reshape(n, 2, 8 * h, 8 * w)


def test_convex_upsample_matches_raft(rng):
    b, h, w = 2, 6, 7
    flow = rng.standard_normal((b, h, w, 2)).astype(np.float32)
    mask = rng.standard_normal((b, h, w, 576)).astype(np.float32)

    ours = np.asarray(ops.convex_upsample(jnp.asarray(flow), jnp.asarray(mask)))
    ref = torch_upsample_flow(nchw(flow), nchw(mask))
    np.testing.assert_allclose(ours, to_nhwc(ref), rtol=1e-4, atol=1e-4)

    # s_major fast path: permuted mask channels + s_major decode == default.
    from accflow_tpu.ops.upsample import mask_s_major_perm

    perm = mask_s_major_perm(576)
    ours_s = np.asarray(
        ops.convex_upsample(
            jnp.asarray(flow), jnp.asarray(mask[..., perm]), s_major=True
        )
    )
    np.testing.assert_allclose(ours_s, ours, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Correlation pyramid + lookup (CorrBlock)
# ---------------------------------------------------------------------------

def torch_corr_block(fmap1, fmap2, coords, num_levels=4, radius=4):
    """Inline reimplementation of networks/raft/corr.py semantics."""
    batch, dim, ht, wd = fmap1.shape
    f1 = fmap1.view(batch, dim, ht * wd)
    f2 = fmap2.view(batch, dim, ht * wd)
    corr = torch.matmul(f1.transpose(1, 2), f2).view(batch, ht, wd, 1, ht, wd)
    corr = corr / torch.sqrt(torch.tensor(dim).float())
    corr = corr.reshape(batch * ht * wd, 1, ht, wd)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = F.avg_pool2d(corr, 2, stride=2)
        pyramid.append(corr)

    r = radius
    coords = coords.permute(0, 2, 3, 1)
    b, h1, w1, _ = coords.shape
    out_pyramid = []
    for i, corr in enumerate(pyramid):
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
        centroid = coords.reshape(b * h1 * w1, 1, 1, 2) / 2**i
        coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        # reference bilinear_sampler
        hh, ww = corr.shape[-2:]
        xg, yg = coords_lvl.split([1, 1], dim=-1)
        xg = 2 * xg / (ww - 1) - 1
        yg = 2 * yg / (hh - 1) - 1
        sampled = F.grid_sample(
            corr, torch.cat([xg, yg], dim=-1), align_corners=True
        )
        out_pyramid.append(sampled.view(b, h1, w1, -1))
    return torch.cat(out_pyramid, dim=-1).permute(0, 3, 1, 2).contiguous()


def test_corr_pyramid_lookup_matches_corrblock(rng):
    b, h, w, c = 2, 16, 16, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-2, 2, size=(b, h, w, 2)).astype(np.float32)
    )

    pyr = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    ours = np.asarray(ops.lookup_corr(pyr, jnp.asarray(coords), radius=4))

    ref = torch_corr_block(nchw(f1), nchw(f2), nchw(coords))
    np.testing.assert_allclose(ours, to_nhwc(ref), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Occlusion masks
# ---------------------------------------------------------------------------

def test_photometric_occ_binary(rng):
    b, h, w, c = 1, 12, 12, 3
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    flow = rng.standard_normal((b, h, w, 2)).astype(np.float32)

    occ = np.asarray(ops.photometric_occ(jnp.asarray(flow), jnp.asarray(f1), jnp.asarray(f2)))
    assert occ.shape == (b, h, w, 1)
    assert set(np.unique(occ)).issubset({0.0, 1.0})

    emap = np.asarray(
        ops.photometric_occ(jnp.asarray(flow), jnp.asarray(f1), jnp.asarray(f2), binary=False)
    )
    assert emap.shape == (b, h, w, c)


def test_calc_occ_mask_shapes(rng):
    b, h, w = 2, 16, 16
    fflow = (3 * rng.standard_normal((b, h, w, 2))).astype(np.float32)
    bflow = (3 * rng.standard_normal((b, h, w, 2))).astype(np.float32)
    occ_bw, occ_fw = ops.calc_occ_mask(jnp.asarray(bflow), jnp.asarray(fflow))
    assert occ_bw.shape == (b, h, w, 1) and occ_fw.shape == (b, h, w, 1)
    # Identical zero flows are perfectly consistent -> no occlusion.
    zero = jnp.zeros((b, h, w, 2))
    ob, of = ops.calc_occ_mask(zero, zero)
    assert float(jnp.sum(ob)) == 0.0 and float(jnp.sum(of)) == 0.0


# ---------------------------------------------------------------------------
# Deformable conv vs a naive torch reference (torchvision semantics)
# ---------------------------------------------------------------------------

def torch_deform_conv3x3(x, offset, mask, weight, bias):
    """Naive reference following torchvision deform_conv2d_kernel.cpp:
    offset channel 2k = dy, 2k+1 = dx for tap k = ky*3+kx; bilinear with
    zeros padding; modulated by sigmoid-free mask (mask passed as-is)."""
    n, cin, h, w = x.shape
    cout = weight.shape[0]
    out = torch.zeros(n, cout, h, w)
    for b in range(n):
        for i in range(h):
            for j in range(w):
                acc = torch.zeros(cout)
                for k in range(9):
                    ky, kx = k // 3, k % 3
                    py = i + ky - 1 + offset[b, 2 * k, i, j]
                    px = j + kx - 1 + offset[b, 2 * k + 1, i, j]
                    y0, x0 = int(np.floor(py)), int(np.floor(px))
                    fy, fx = float(py - y0), float(px - x0)
                    val = torch.zeros(cin)
                    for dy2, wy in ((0, 1 - fy), (1, fy)):
                        for dx2, wx in ((0, 1 - fx), (1, fx)):
                            yy, xx = y0 + dy2, x0 + dx2
                            if 0 <= yy < h and 0 <= xx < w:
                                val += wy * wx * x[b, :, yy, xx]
                    val = val * mask[b, k, i, j]
                    acc += weight[:, :, ky, kx] @ val
                out[b, :, i, j] = acc + bias
    return out


def test_deform_conv_matches_naive_torch(rng):
    n, h, w, cin, cout = 1, 5, 6, 4, 3
    x = rng.standard_normal((n, h, w, cin)).astype(np.float32)
    offsets = (2.0 * rng.standard_normal((n, h, w, 18))).astype(np.float32)
    mask = rng.uniform(0, 1, size=(n, h, w, 9)).astype(np.float32)
    weight_t = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)

    ours = np.asarray(
        ops.deform_conv3x3(
            jnp.asarray(x),
            jnp.asarray(offsets),
            jnp.asarray(mask),
            jnp.asarray(weight_t.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            jnp.asarray(bias),
        )
    )
    ref = torch_deform_conv3x3(
        nchw(x), nchw(offsets), nchw(mask), torch.from_numpy(weight_t),
        torch.from_numpy(bias),
    )
    np.testing.assert_allclose(ours, to_nhwc(ref), rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# InputPadder
# ---------------------------------------------------------------------------

def test_input_padder_roundtrip(rng):
    x = rng.standard_normal((1, 13, 21, 3)).astype(np.float32)
    padder = ops.InputPadder(x.shape)
    (padded,) = padder.pad(jnp.asarray(x))
    assert padded.shape[1] % 8 == 0 and padded.shape[2] % 8 == 0
    back = np.asarray(padder.unpad(padded))
    np.testing.assert_allclose(back, x)


def test_lookup_corr_mm_equals_gather(rng):
    """The matmul-based fast lookup must match the gather-based reference
    path bit-for-tolerance (same zeros-padding semantics)."""
    b, h, w, c = 2, 16, 16, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-20, 20, size=(b, h, w, 2)).astype(np.float32)
    )
    pyr = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    fast = np.asarray(ops.lookup_corr(pyr, jnp.asarray(coords), radius=4))
    ref = np.asarray(ops.lookup_corr_gather(pyr, jnp.asarray(coords), radius=4))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-4)


def test_lookup_corr_on_demand_equals_mm(rng):
    """The streaming (volume-free) lookup is numerically identical to the
    materialized-volume mm lookup, for every chunking (incl. non-divisor
    requests, which round down to a divisor) — and it differentiates
    (memory-bounded training path: the chunk body is rematerialized)."""
    import jax

    b, h, w, c = 2, 16, 16, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-20, 20, size=(b, h, w, 2)).astype(np.float32)
    )
    pyr = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    ref = np.asarray(ops.lookup_corr(pyr, jnp.asarray(coords), radius=4))

    od = ops.build_corr_on_demand(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    for chunk in (256, 64, 37, 1000):  # 37/1000 -> non-divisors round down
        got = np.asarray(
            ops.lookup_corr_on_demand(od, jnp.asarray(coords), radius=4, chunk=chunk)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # Both recompute-einsum forms are exact regardless of what the size
    # gate would pick (the "auto" default routes small chunks to bqyx and
    # large ones to bqk — ops/corr.py::_OD_EINSUM; forcing each branch
    # keeps the unselected one covered).
    import accflow_tpu.ops.corr as corr_mod

    for form in ("bqyx", "bqk"):
        old = corr_mod._OD_EINSUM
        corr_mod._OD_EINSUM = form
        try:
            got = np.asarray(
                ops.lookup_corr_on_demand(
                    od, jnp.asarray(coords), radius=4, chunk=64
                )
            )
        finally:
            corr_mod._OD_EINSUM = old
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # dispatch surface + wrong-operand / bad-suffix errors
    got = np.asarray(ops.lookup(od, jnp.asarray(coords), radius=4, impl="ondemand:64"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    with pytest.raises(TypeError):
        ops.lookup(pyr, jnp.asarray(coords), radius=4, impl="ondemand")
    with pytest.raises(TypeError):
        ops.lookup(od, jnp.asarray(coords), radius=4, impl="mm")
    with pytest.raises(ValueError, match="chunk suffix"):
        ops.lookup(od, jnp.asarray(coords), radius=4, impl="ondemand:1k")
    # Non-positive chunks would silently clamp to per-query serialization
    # (~10x slower) — they must fail loudly instead.
    with pytest.raises(ValueError, match="must be positive"):
        ops.lookup(od, jnp.asarray(coords), radius=4, impl="ondemand:0")
    with pytest.raises(ValueError, match="must be positive"):
        ops.lookup(od, jnp.asarray(coords), radius=4, impl="ondemand:-8")

    # pre-chunked operands (the hoisted in-loop form) are identical
    from accflow_tpu.ops.corr import prepare_ondemand_chunks

    odc = prepare_ondemand_chunks(od, 64)
    got = np.asarray(
        ops.lookup_corr_on_demand(odc, jnp.asarray(coords), radius=4)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    # vol_dtype quantization matches a stored volume of the same dtype
    pyr_bf = ops.build_corr_pyramid(
        jnp.asarray(f1), jnp.asarray(f2), num_levels=4, dtype=jnp.bfloat16
    )
    ref_bf = np.asarray(ops.lookup_corr(pyr_bf, jnp.asarray(coords), radius=4))
    od_bf = ops.build_corr_on_demand(
        jnp.asarray(f1), jnp.asarray(f2), num_levels=4, dtype=jnp.bfloat16
    )
    got_bf = np.asarray(
        ops.lookup_corr_on_demand(od_bf, jnp.asarray(coords), radius=4, chunk=64)
    )
    np.testing.assert_allclose(got_bf, ref_bf, rtol=1e-5, atol=1e-5)

    # gradients flow through the remat'd chunked path (wrt both features)
    def loss_od(a, b_):
        odx = ops.build_corr_on_demand(a, b_, num_levels=4)
        return ops.lookup_corr_on_demand(odx, jnp.asarray(coords), radius=4, chunk=64).sum()

    def loss_mm(a, b_):
        pyrx = ops.build_corr_pyramid(a, b_, num_levels=4)
        return ops.lookup_corr(pyrx, jnp.asarray(coords), radius=4).sum()

    g_od = jax.grad(loss_od, argnums=(0, 1))(jnp.asarray(f1), jnp.asarray(f2))
    g_mm = jax.grad(loss_mm, argnums=(0, 1))(jnp.asarray(f1), jnp.asarray(f2))
    for a, b_ in zip(g_od, g_mm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_raft_forward_ondemand_matches_mm(rng):
    """Full RAFT forward with corr_lookup='ondemand' == the mm volume path
    (float32), for both the basic and small variants."""
    import jax
    from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_forward

    i1 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    for small in (False, True):
        cfg_mm = RAFTConfig(small=small, compute_dtype="float32", corr_lookup="mm")
        cfg_od = RAFTConfig(
            small=small, compute_dtype="float32", corr_lookup="ondemand:16"
        )
        params = init_raft(jax.random.PRNGKey(0), cfg_mm)
        out_mm = raft_forward(params, i1, i2, cfg_mm, iters=3)
        out_od = raft_forward(params, i1, i2, cfg_od, iters=3)
        np.testing.assert_allclose(
            np.asarray(out_od["flow_up"]), np.asarray(out_mm["flow_up"]),
            rtol=1e-4, atol=1e-4,
        )


def test_corr_lookup_auto_resolution(rng, monkeypatch):
    """corr_lookup='auto' picks the stored-volume path while it fits the
    budget and the volume-free mode beyond it; both produce the default
    path's flows."""
    import jax
    from accflow_tpu.ops import corr as corr_mod
    from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_forward

    assert corr_mod.resolve_auto_lookup("auto", 1, 64, 64) == "fused"
    # 2048^2 at pair-batch 3: 3 * 65536^2 * 1.33 * 4 B >> 4 GB
    assert corr_mod.resolve_auto_lookup("auto", 3, 256, 256) == "ondemand"
    assert corr_mod.resolve_auto_lookup("mm", 3, 256, 256) == "mm"
    # The budget counts the PADDED layout: levels are (B*Q, hl, wl) and XLA
    # pads wl to 128 lanes / hl to the sublane multiple, so 512^2 levels
    # cost 2.8x their logical bytes (CLAUDE.md's documented OOM driver).
    assert corr_mod.stored_volume_bytes(1, 64, 64) == 4096 * 15360 * 4
    # 768^2 batch 8: logical 3.4 GB would sail under the budget, padded
    # 6.5 GB correctly switches to the volume-free mode.
    assert corr_mod.resolve_auto_lookup("auto", 8, 96, 96) == "ondemand"
    # corr_levels and corr_volume_dtype change the footprint and are honored.
    assert corr_mod.resolve_auto_lookup("auto", 8, 96, 96, num_levels=1) == "fused"
    assert corr_mod.resolve_auto_lookup("auto", 3, 128, 128) == "ondemand"
    assert corr_mod.resolve_auto_lookup(
        "auto", 3, 128, 128, dtype=jnp.bfloat16) == "fused"

    i1 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    cfg_mm = RAFTConfig(compute_dtype="float32", corr_lookup="mm")
    cfg_auto = RAFTConfig(compute_dtype="float32", corr_lookup="auto")
    params = init_raft(jax.random.PRNGKey(0), cfg_mm)
    ref = np.asarray(raft_forward(params, i1, i2, cfg_mm, iters=2)["flow_up"])
    # small shape -> auto resolves to fused
    out = raft_forward(params, i1, i2, cfg_auto, iters=2)["flow_up"]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    # shrink the budget -> auto resolves to ondemand; flows unchanged
    monkeypatch.setattr(corr_mod, "AUTO_VOLUME_BYTES", 1)
    out_od = raft_forward(params, i1, i2, cfg_auto, iters=2)["flow_up"]
    np.testing.assert_allclose(np.asarray(out_od), ref, rtol=1e-4, atol=1e-4)


def test_gma_attn_chunk_auto(rng, monkeypatch):
    """attn_chunk=-1 resolves per input shape: dense under the budget,
    chunked above it — flows identical either way."""
    import jax
    from accflow_tpu.models import gma as gma_mod
    from accflow_tpu.models.gma import GMAConfig, gma_forward, init_gma
    from accflow_tpu.ops import corr as corr_mod

    assert gma_mod.resolve_auto_attn_chunk(-1, 1, 1, 64, 64) == 0
    assert gma_mod.resolve_auto_attn_chunk(-1, 3, 1, 256, 256) == 1024
    assert gma_mod.resolve_auto_attn_chunk(16, 3, 1, 256, 256) == 16
    # The corr volume and the attention matrix share ONE budget: bytes a
    # stored corr volume reserves push attention into chunking earlier.
    assert gma_mod.resolve_auto_attn_chunk(-1, 1, 1, 160, 160) == 0  # 3.7 GB
    assert gma_mod.resolve_auto_attn_chunk(
        -1, 1, 1, 160, 160, reserved_bytes=1 << 30) == 1024
    # f32 compute stores the softmaxed matrix at 4 B not 2 B (8 B/elem
    # total with the f32 similarity temporary): 160^2 queries = 5.2 GB.
    assert gma_mod.resolve_auto_attn_chunk(
        -1, 1, 1, 160, 160, compute_dtype="float32") == 1024
    # Positional branches have no chunked form: auto stays dense at any
    # size (dense memory cost over a mid-forward ValueError).
    assert gma_mod.resolve_auto_attn_chunk(
        -1, 3, 1, 256, 256, positional=True) == 0

    # gma_forward wires the resolved corr volume's padded bytes into the
    # attention resolution (both stored structures coexist in HBM).
    seen = {}
    real_resolve = gma_mod.resolve_auto_attn_chunk

    def spy(attn_chunk, batch, heads, h8, w8, reserved_bytes=0, **kw):
        seen["reserved"] = reserved_bytes
        return real_resolve(attn_chunk, batch, heads, h8, w8,
                            reserved_bytes, **kw)

    monkeypatch.setattr(gma_mod, "resolve_auto_attn_chunk", spy)

    i1 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    cfg_dense = GMAConfig(compute_dtype="float32")
    cfg_auto = GMAConfig(compute_dtype="float32", attn_chunk=-1)
    params = init_gma(jax.random.PRNGKey(0), cfg_dense)
    ref = np.asarray(gma_forward(params, i1, i2, cfg_dense, iters=2)["flow_up"])
    out = gma_forward(params, i1, i2, cfg_auto, iters=2)["flow_up"]
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    # corr resolved to a stored impl at this shape -> its padded bytes were
    # reserved against the attention budget.
    assert seen["reserved"] == corr_mod.stored_volume_bytes(1, 8, 8)
    monkeypatch.setattr(corr_mod, "AUTO_VOLUME_BYTES", 1)
    out_ch = gma_forward(params, i1, i2, cfg_auto, iters=2)["flow_up"]
    np.testing.assert_allclose(np.asarray(out_ch), ref, rtol=1e-4, atol=1e-4)


def test_gma_forward_ondemand_matches_mm(rng):
    """GMA threads corr_lookup through the same dispatcher: on-demand
    (volume-free) == mm volume path."""
    import jax
    from accflow_tpu.models.gma import GMAConfig, gma_forward, init_gma

    i1 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    cfg_mm = GMAConfig(compute_dtype="float32", corr_lookup="mm")
    cfg_od = GMAConfig(compute_dtype="float32", corr_lookup="ondemand:16")
    params = init_gma(jax.random.PRNGKey(0), cfg_mm)
    out_mm = gma_forward(params, i1, i2, cfg_mm, iters=2)
    out_od = gma_forward(params, i1, i2, cfg_od, iters=2)
    np.testing.assert_allclose(
        np.asarray(out_od["flow_up"]), np.asarray(out_mm["flow_up"]),
        rtol=1e-4, atol=1e-4,
    )


def test_gma_attn_chunked_matches_dense(rng):
    """attn_chunk>0 (on-demand softmax(qk)v per query chunk) == the dense
    stored-attention path, composed with volume-free corr — the full
    GMA high-resolution memory configuration."""
    import jax
    from accflow_tpu.models.gma import GMAConfig, gma_forward, init_gma

    i1 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    cfg_dense = GMAConfig(compute_dtype="float32", corr_lookup="mm")
    cfg_chunk = GMAConfig(
        compute_dtype="float32", corr_lookup="ondemand:16", attn_chunk=16
    )
    params = init_gma(jax.random.PRNGKey(0), cfg_dense)
    out_dense = gma_forward(params, i1, i2, cfg_dense, iters=2)
    out_chunk = gma_forward(params, i1, i2, cfg_chunk, iters=2)
    np.testing.assert_allclose(
        np.asarray(out_chunk["flow_up"]), np.asarray(out_dense["flow_up"]),
        rtol=1e-4, atol=1e-4,
    )
    with pytest.raises(ValueError, match="content-only"):
        gma_forward(
            params, i1, i2,
            GMAConfig(compute_dtype="float32", attn_chunk=16, position_only=True),
            iters=1,
        )


def test_lookup_corr_patch_equals_gather(rng):
    b, h, w, c = 2, 16, 16, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-20, 20, size=(b, h, w, 2)).astype(np.float32)
    )
    pyr = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    fast = np.asarray(ops.lookup_corr_patch(pyr, jnp.asarray(coords), radius=4))
    ref = np.asarray(ops.lookup_corr_gather(pyr, jnp.asarray(coords), radius=4))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-4)


def test_lookup_corr_rows_equals_gather(rng):
    b, h, w, c = 2, 16, 16, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-20, 20, size=(b, h, w, 2)).astype(np.float32)
    )
    pyr = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    fast = np.asarray(ops.lookup_corr_rows(pyr, jnp.asarray(coords), radius=4))
    ref = np.asarray(ops.lookup_corr_gather(pyr, jnp.asarray(coords), radius=4))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-4)


def test_lookup_corr_pallas_equals_gather(rng):
    """Fused Pallas lookup (interpret mode on CPU) vs the gather reference."""
    b, h, w, c = 2, 16, 16, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-20, 20, size=(b, h, w, 2)).astype(np.float32)
    )
    pyr = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    fast = np.asarray(
        ops.lookup_corr_pallas(pyr, jnp.asarray(coords), radius=4, stream_dtype=None)
    )
    ref = np.asarray(ops.lookup_corr_gather(pyr, jnp.asarray(coords), radius=4))
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-4)
    # bf16-streamed fast path: quantization-level agreement only.
    fast_bf = np.asarray(ops.lookup_corr_pallas(pyr, jnp.asarray(coords), radius=4))
    np.testing.assert_allclose(fast_bf, ref, rtol=2e-2, atol=5e-2)


def test_lookup_corr_fused_pallas_equals_gather(rng):
    """Fused all-levels Pallas kernel (interpret mode on CPU) vs gather.

    Covers both level impls: at this shape level 0 takes the "packed"
    bitcast-streaming path (256 % 128 == 0) and levels 1-3 the "3d" path.
    """
    b, h, w, c = 2, 16, 16, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-20, 20, size=(b, h, w, 2)).astype(np.float32)
    )
    pyr = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    ref = np.asarray(ops.lookup_corr_gather(pyr, jnp.asarray(coords), radius=4))
    fast = np.asarray(
        ops.lookup_corr_fused_from_pyramid(
            pyr, jnp.asarray(coords), radius=4, stream_dtype=jnp.float32
        )
    )
    np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-4)
    # bf16-streamed serving path: quantization-level agreement only.
    fast_bf = np.asarray(
        ops.lookup_corr_fused_from_pyramid(pyr, jnp.asarray(coords), radius=4)
    )
    np.testing.assert_allclose(fast_bf, ref, rtol=2e-2, atol=5e-2)


def test_raft_forward_pallas_fused_matches_mm(rng):
    """End-to-end RAFT forward with corr_lookup="pallas_fused" (interpret
    mode) == the mm lookup forward."""
    import jax

    from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_forward

    cfg = RAFTConfig(iters=2, corr_levels=4, compute_dtype="float32")
    params = init_raft(jax.random.PRNGKey(0), cfg)
    img1 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    out_mm = raft_forward(
        params, img1, img2,
        RAFTConfig(iters=2, corr_lookup="mm", compute_dtype="float32"),
        final_only=True,
    )["flow_up"]
    out_pf = raft_forward(
        params, img1, img2,
        RAFTConfig(iters=2, corr_lookup="pallas_fused", compute_dtype="float32"),
        final_only=True,
    )["flow_up"]
    np.testing.assert_allclose(
        np.asarray(out_pf), np.asarray(out_mm), rtol=1e-3, atol=1e-3
    )


def test_stem_s2d_and_unroll_match_reference_path(rng):
    """The space-to-depth stem reformulation and the unrolled GRU scan are
    exact rewrites: (a) the folded 4x4/1 stem conv == the 7x7/2 conv, and
    (b) a full RAFT forward with stem_s2d + scan_unroll == the default
    path (f32, tolerance = summation-order noise)."""
    import jax

    from accflow_tpu.models.encoders import _s2d_stem_conv
    from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_forward
    from accflow_tpu.nn.layers import conv2d, init_conv

    p = init_conv(jax.random.PRNGKey(1), 3, 64, 7)
    x = jnp.asarray(rng.standard_normal((2, 64, 96, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(_s2d_stem_conv(p, x)),
        np.asarray(conv2d(p, x, stride=2)),
        rtol=1e-5, atol=1e-5,
    )

    cfg = RAFTConfig(iters=3, compute_dtype="float32")
    params = init_raft(jax.random.PRNGKey(0), cfg)
    img1 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    base = raft_forward(params, img1, img2, cfg, final_only=True)["flow_up"]
    fast = raft_forward(
        params, img1, img2,
        RAFTConfig(iters=3, compute_dtype="float32", stem_s2d=True,
                   scan_unroll=4),
        final_only=True,
    )["flow_up"]
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(base), rtol=1e-3, atol=1e-3
    )


def test_lookup_corr_split_matches_flat(rng):
    """Per-level split lookup == the flattened mm lookup, reassembled."""
    b, h, w, c = 2, 16, 16, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-20, 20, size=(b, h, w, 2)).astype(np.float32)
    )
    pyr = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    from accflow_tpu.ops.corr import lookup_corr_split

    levels = lookup_corr_split(pyr, jnp.asarray(coords), radius=4)
    flat = np.concatenate(
        [np.asarray(l).reshape(b, h, w, 81) for l in levels], axis=-1
    )
    ref = np.asarray(ops.lookup_corr(pyr, jnp.asarray(coords), radius=4))
    np.testing.assert_allclose(flat, ref, rtol=1e-5, atol=1e-5)


def test_lookup_corr_split_packed_matches_flat(rng):
    """Packed small-level lookup == the flattened mm lookup exactly
    (masked tents + zero x-padding reproduce zeros-padding sampling)."""
    b, h, w, c = 2, 16, 16, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-20, 20, size=(b, h, w, 2)).astype(np.float32)
    )
    pyr = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    from accflow_tpu.ops.corr import lookup_corr_split_packed

    lvl0, packed = lookup_corr_split_packed(pyr, jnp.asarray(coords), radius=4)
    flat = np.concatenate(
        [np.asarray(lvl0).reshape(b, h, w, 81)]
        + [np.asarray(packed[:, :, :, l]).reshape(b, h, w, 81) for l in range(3)],
        axis=-1,
    )
    ref = np.asarray(ops.lookup_corr(pyr, jnp.asarray(coords), radius=4))
    np.testing.assert_allclose(flat, ref, rtol=1e-5, atol=1e-5)

    # start=2 variant: mm for levels 0-1, tiny levels packed.
    lvl0b, lvl1b, packed2 = lookup_corr_split_packed(
        pyr, jnp.asarray(coords), radius=4, start=2
    )
    flat2 = np.concatenate(
        [np.asarray(lvl0b).reshape(b, h, w, 81),
         np.asarray(lvl1b).reshape(b, h, w, 81)]
        + [np.asarray(packed2[:, :, :, l]).reshape(b, h, w, 81) for l in range(2)],
        axis=-1,
    )
    np.testing.assert_allclose(flat2, ref, rtol=1e-5, atol=1e-5)


def test_lookup_corr_split_vpu_matches_mxu(rng):
    b, h, w, c = 2, 16, 16, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-20, 20, size=(b, h, w, 2)).astype(np.float32)
    )
    pyr = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    from accflow_tpu.ops.corr import lookup_corr_split

    a = lookup_corr_split(pyr, jnp.asarray(coords), radius=4)
    b_ = lookup_corr_split(pyr, jnp.asarray(coords), radius=4, x_contraction="vpu")
    for la, lb in zip(a, b_):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-5, atol=1e-5)


def test_lookup_corr_split_v2_variants_match(rng):
    """Every per-level window formulation of lookup_corr_split_v2 (mm,
    vpu_y, rows, rows_gx) is numerically equivalent to lookup_corr_split."""
    b, h, w, c = 2, 16, 16, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-20, 20, size=(b, h, w, 2)).astype(np.float32)
    )
    pyr = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    from accflow_tpu.ops.corr import lookup_corr_split, lookup_corr_split_v2

    ref = lookup_corr_split(pyr, jnp.asarray(coords), radius=4)
    for impl in ("mm", "vpu_y", "rows", "rows_gx"):
        got = lookup_corr_split_v2(
            pyr, jnp.asarray(coords), radius=4, level_impl=(impl,) * 4
        )
        for la, lb in zip(ref, got):
            np.testing.assert_allclose(
                np.asarray(lb), np.asarray(la), rtol=1e-4, atol=1e-4,
                err_msg=impl,
            )


def test_motion_encoder_stacked_matches_split(rng):
    """convc1 as one stacked (Q, L*81) GEMM == per-level einsums == the
    flat conv (basic_motion_encoder)."""
    from accflow_tpu.models.raft import (
        RAFTConfig,
        basic_motion_encoder,
        basic_motion_encoder_split,
        basic_motion_encoder_stacked,
        init_basic_motion_encoder,
    )

    import jax

    cfg = RAFTConfig(compute_dtype="float32")
    p = init_basic_motion_encoder(jax.random.PRNGKey(0), cfg.corr_planes)
    n, h, w = 2, 8, 8
    flow = jnp.asarray(rng.standard_normal((n, h, w, 2)).astype(np.float32))
    levels = [
        jnp.asarray(rng.standard_normal((n, h, w, 9, 9)).astype(np.float32))
        for _ in range(4)
    ]
    flat = jnp.concatenate([l.reshape(n, h, w, 81) for l in levels], axis=-1)

    ref = np.asarray(basic_motion_encoder(p, flow, flat))
    split = np.asarray(basic_motion_encoder_split(p, flow, levels))
    stacked = np.asarray(basic_motion_encoder_stacked(p, flow, levels))
    np.testing.assert_allclose(split, ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(stacked, ref, rtol=1e-4, atol=1e-4)


def test_corr_single_scale_matches_level0(rng):
    """CorrBlockSingleScale (networks/gma/corr.py:61-99) == level 0 of the
    pyramid: same volume, same 81-tap lookup, no pooling."""
    from accflow_tpu.ops.corr import build_corr_single_scale

    b, h, w, c = 2, 16, 16, 16
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-6, 6, size=(b, h, w, 2)).astype(np.float32)
    )
    pyr_ss = build_corr_single_scale(jnp.asarray(f1), jnp.asarray(f2))
    assert len(pyr_ss.levels) == 1
    out_ss = np.asarray(ops.lookup_corr_gather(pyr_ss, jnp.asarray(coords), radius=4))
    pyr_full = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    out_full = np.asarray(
        ops.lookup_corr_gather(pyr_full, jnp.asarray(coords), radius=4)
    )
    np.testing.assert_allclose(out_ss, out_full[..., :81], rtol=1e-5, atol=1e-5)


def test_instance_norm_matches_torch_f32(rng):
    """float32 path: exact two-pass torch InstanceNorm2d semantics
    (no affine, eps 1e-5 — the encoder norms, nn/layers.py)."""
    from accflow_tpu.nn.layers import instance_norm

    x = rng.normal(1.5, 2.0, (2, 9, 13, 8)).astype(np.float32)
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    ref = to_nhwc(F.instance_norm(nchw(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_instance_norm_bf16_close_to_f32(rng):
    """bf16 fast path (f32 one-pass stats + bf16 normalize arithmetic,
    shipped r4 after the streaming-step trace): output must stay within
    bf16 rounding scale of the exact f32 result — the same tolerance the
    bf16 compute path already accepts at every conv output."""
    from accflow_tpu.nn.layers import instance_norm

    x = rng.normal(1.5, 2.0, (2, 64, 64, 32)).astype(np.float32)
    exact = np.asarray(instance_norm(jnp.asarray(x)))
    fast = np.asarray(
        instance_norm(jnp.asarray(x).astype(jnp.bfloat16)).astype(jnp.float32)
    )
    # Output is unit-std per (sample, channel); bf16 has ~2-3 decimal
    # digits. Allow a few ULP at the observed |x| <= ~5 range.
    assert np.max(np.abs(fast - exact)) < 0.12
    # and the error must be noise, not a systematic per-channel shift:
    assert np.max(np.abs((fast - exact).mean(axis=(1, 2)))) < 0.01


def test_lookup_corr_on_demand_degenerate_level(rng):
    """Tiny frames make the coarsest pyramid level zero-sized (e.g. 4x4
    features pool to (2,2),(1,1),(0,0)); the on-demand recompute must
    still match the stored-volume path there — the bqyx einsum's f2 view
    once died on a ZeroDivisionError inferring -1 past a 0 dim (caught
    by the r5 full-suite run via the demo CLI)."""
    b, h, w, c = 1, 4, 4, 8
    f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)
    coords = (
        np.asarray(ops.coords_grid(b, h, w))
        + rng.uniform(-2, 2, size=(b, h, w, 2)).astype(np.float32)
    )
    pyr = ops.build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    ref = np.asarray(ops.lookup_corr(pyr, jnp.asarray(coords), radius=4))
    od = ops.build_corr_on_demand(jnp.asarray(f1), jnp.asarray(f2), num_levels=4)
    for chunk in (0, 8):  # AUTO single-chunk and a chunked lax.map
        got = np.asarray(
            ops.lookup_corr_on_demand(od, jnp.asarray(coords), radius=4,
                                      chunk=chunk)
        )
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
