"""Full-model numerical parity vs the PyTorch reference implementation.

These tests import the reference code from /root/reference (read-only),
initialize the torch models with their default random init, convert the
state_dict through accflow_tpu.convert, and compare forward outputs.
They are skipped when the reference tree is absent.

Sizes: images must be >= 128x128 so the reference's 4-level corr pyramid
never reaches a 1x1 map (its (W-1) grid normalization divides by zero
there — at the production 512^2 it bottoms out at 8x8).
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)

# sys.path + torchvision.ops.DeformConv2d stand-in (shared with
# test_parity_real.py).
import _torch_ref  # noqa: F401,E402


def _np(t):
    return t.detach().cpu().numpy()


def nhwc(t):
    return jnp.asarray(np.moveaxis(_np(t), 1, -1))


@pytest.fixture(scope="module")
def image_pair():
    rng = np.random.default_rng(42)
    i1 = rng.uniform(-1, 1, (1, 3, 128, 128)).astype(np.float32)
    i2 = rng.uniform(-1, 1, (1, 3, 128, 128)).astype(np.float32)
    return torch.from_numpy(i1), torch.from_numpy(i2)


def test_raft_parity(image_pair):
    import argparse
    from networks.raft.raft import RAFT

    from accflow_tpu.convert.torch_weights import convert_state_dict
    from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_forward

    torch.manual_seed(0)
    model = RAFT(argparse.Namespace(small=False, mixed_precision=False)).eval()
    i1, i2 = image_pair
    with torch.no_grad():
        ref = model(i1, i2, iters=6)

    cfg = RAFTConfig(compute_dtype="float32", iters=6)
    template = init_raft(jax.random.PRNGKey(0), cfg)
    params = convert_state_dict(template, model.state_dict())
    out = raft_forward(params, nhwc(i1), nhwc(i2), cfg)

    ours = np.moveaxis(np.asarray(out["flow_up"]), -1, 1)
    np.testing.assert_allclose(ours, _np(ref), rtol=1e-3, atol=5e-3)


def test_gma_parity(image_pair):
    import argparse
    from networks.gma.gma import RAFTGMA

    from accflow_tpu.convert.torch_weights import convert_state_dict
    from accflow_tpu.models.gma import GMAConfig, init_gma, gma_forward

    torch.manual_seed(1)
    model = RAFTGMA(
        argparse.Namespace(
            num_heads=1,
            mixed_precision=False,
            position_only=False,
            position_and_content=False,
        )
    ).eval()
    i1, i2 = image_pair
    with torch.no_grad():
        ref = model(i1, i2, iters=6)

    cfg = GMAConfig(compute_dtype="float32", iters=6)
    template = init_gma(jax.random.PRNGKey(0), cfg)
    params = convert_state_dict(template, model.state_dict())
    out = gma_forward(params, nhwc(i1), nhwc(i2), cfg)

    ours = np.moveaxis(np.asarray(out["flow_up"]), -1, 1)
    np.testing.assert_allclose(ours, _np(ref), rtol=1e-3, atol=5e-3)


def test_accflow_parity():
    import argparse
    from networks.raft.raft import RAFT
    from networks.AccFlow_ import AccFlow

    from accflow_tpu.convert.torch_weights import (
        convert_state_dict,
        split_accflow_state,
    )
    from accflow_tpu.models import FlowEstimator
    from accflow_tpu.models.accflow import (
        AccFlowConfig,
        accflow_forward,
        init_accflow,
    )
    from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_forward

    torch.manual_seed(2)
    ofe = RAFT(argparse.Namespace(small=False, mixed_precision=False)).eval()
    model = AccFlow(ofe).eval()
    model.mixed_precision = False

    rng = np.random.default_rng(7)
    frames_np = rng.uniform(-1, 1, (4, 1, 3, 128, 128)).astype(np.float32)
    frames_t = [torch.from_numpy(f) for f in frames_np]
    with torch.no_grad():
        ref_outs = model(images=frames_t, test_mode=False)

    sd = model.state_dict()
    ofe_sd, acc_sd = split_accflow_state(sd)

    rcfg = RAFTConfig(compute_dtype="float32", iters=12)
    ofe_params = convert_state_dict(init_raft(jax.random.PRNGKey(0), rcfg), ofe_sd)
    acfg = AccFlowConfig(compute_dtype="float32")
    acc_params = convert_state_dict(init_accflow(jax.random.PRNGKey(1), acfg), acc_sd)

    frames = jnp.asarray(np.moveaxis(frames_np, 2, -1))
    ofe_fn = lambda a, b: raft_forward(ofe_params, a, b, rcfg)["flow_up"]
    outs = accflow_forward(acc_params, ofe_fn, frames, acfg)

    assert outs.shape[0] == len(ref_outs) == 2
    for i, ref in enumerate(ref_outs):
        ours = np.moveaxis(np.asarray(outs[i]), -1, 1)
        np.testing.assert_allclose(ours, _np(ref), rtol=2e-3, atol=2e-2)


def test_accflow_gma_parity(tmp_path):
    """AccFlow wrapping RAFTGMA (the acc+gma-{things,cvo}.pth released
    checkpoints' path: /root/reference/networks/AccFlow_.py:145 with
    networks/gma/gma.py:14, built by test_cvo.py:11-21): torch-converted
    weights, numerical output match, THEN an evaluate_cvo("acc|gma",
    acc_ckpt=...) end-to-end smoke through the same converter branch."""
    import argparse

    from networks.AccFlow_ import AccFlow
    from networks.gma.gma import RAFTGMA

    from accflow_tpu.convert.torch_weights import (
        convert_state_dict,
        split_accflow_state,
    )
    from accflow_tpu.data.synthetic import write_synthetic_cvor
    from accflow_tpu.models.accflow import (
        AccFlowConfig,
        accflow_forward,
        init_accflow,
    )
    from accflow_tpu.models.gma import GMAConfig, gma_forward, init_gma
    from accflow_tpu.train.evaluate import evaluate_cvo

    torch.manual_seed(4)
    ofe = RAFTGMA(
        argparse.Namespace(
            num_heads=1,
            mixed_precision=False,
            position_only=False,
            position_and_content=False,
        )
    ).eval()
    model = AccFlow(ofe).eval()
    model.mixed_precision = False

    rng = np.random.default_rng(13)
    frames_np = rng.uniform(-1, 1, (4, 1, 3, 128, 128)).astype(np.float32)
    frames_t = [torch.from_numpy(f) for f in frames_np]
    with torch.no_grad():
        ref_outs = model(images=frames_t, test_mode=False)

    sd = model.state_dict()
    ofe_sd, acc_sd = split_accflow_state(sd)

    gcfg = GMAConfig(compute_dtype="float32", iters=12)
    ofe_params = convert_state_dict(init_gma(jax.random.PRNGKey(0), gcfg), ofe_sd)
    acfg = AccFlowConfig(compute_dtype="float32")
    acc_params = convert_state_dict(init_accflow(jax.random.PRNGKey(1), acfg), acc_sd)

    frames = jnp.asarray(np.moveaxis(frames_np, 2, -1))
    ofe_fn = lambda a, b: gma_forward(ofe_params, a, b, gcfg)["flow_up"]
    outs = accflow_forward(acc_params, ofe_fn, frames, acfg)

    assert outs.shape[0] == len(ref_outs) == 2
    for i, ref in enumerate(ref_outs):
        ours = np.moveaxis(np.asarray(outs[i]), -1, 1)
        np.testing.assert_allclose(ours, _np(ref), rtol=2e-3, atol=2e-2)

    # End-to-end: the acc_ckpt converter branch with a GMA template
    # (evaluate_cvo builds the GMA template itself from "acc|gma").
    torch.save(sd, tmp_path / "acc_gma.pth")
    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=2, num_test=2, h=64, w=64)
    r = evaluate_cvo(
        "acc|gma", root, batch=2, iters=2,
        acc_ckpt=str(tmp_path / "acc_gma.pth"), compute_dtype="float32",
        result_file=str(tmp_path / "res.txt"),
    )
    assert all(np.isfinite(v) for v in r.values())


def _torch_grad_state(model, allow_missing=False):
    """state_dict-shaped dict of parameter grads (buffers as zeros), so the
    weight converter's pure transposes/reshapes map torch grads into the
    exact layout of the jax grad tree. allow_missing: grad-less params
    (e.g. a frozen OFE under no_grad) become zeros instead of asserting."""
    out = {}
    # remove_duplicate=False: the reference registers the encoder downsample
    # norm under two names sharing one tensor (norm3/norm4 AND downsample.1)
    # and the converter consumes the downsample copy.
    for k, p in model.named_parameters(remove_duplicate=False):
        assert allow_missing or p.grad is not None, f"no grad reached {k}"
        out[k] = torch.zeros_like(p) if p.grad is None else p.grad
    for k, b in model.named_buffers(remove_duplicate=False):
        out[k] = torch.zeros_like(b)
    return out


def _assert_tree_allclose(jax_tree, ref_tree, rtol, atol_frac):
    leaves_j = jax.tree_util.tree_flatten_with_path(jax_tree)[0]
    leaves_r = jax.tree_util.tree_leaves(ref_tree)
    assert len(leaves_j) == len(leaves_r)
    # Global grad scale: leaves whose TRUE grad is zero (e.g. a conv bias
    # feeding BatchNorm — the mean shift is normalized away) hold pure f32
    # noise on both sides; their atol must come from the tree's scale, not
    # the leaf's.
    g = max(float(np.abs(np.asarray(l)).max()) for l in leaves_r)
    for (path, lj), lr in zip(leaves_j, leaves_r):
        r = np.asarray(lr)
        # Per-leaf absolute floor scaled to the leaf's grad magnitude:
        # layer grads span orders of magnitude, one global atol cannot.
        atol = atol_frac * max(float(np.abs(r).max()), 1e-2 * g)
        np.testing.assert_allclose(
            np.asarray(lj), r, rtol=rtol, atol=atol,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_raft_grad_parity(image_pair):
    """Backward-path parity for the fine-tune training step: squared-error
    loss on the final prediction, full gradients through the 4-iteration
    recurrence — pins the per-iteration coords detach (raft.py:129),
    train-mode BatchNorm backward in the context encoder, the corr-lookup
    and convex-upsample backward, and the GRU chain. Torch grads are
    mapped through the weight converter (pure transposes), so the trees
    compare leaf-for-leaf. Squared error instead of the reference's L1
    (whose grad is sign(pred-gt): f32 forward noise flips near-zero
    residual signs, making exact L1-grad comparison ill-posed; the
    network backward path under test is identical)."""
    import argparse
    from networks.raft.raft import RAFT

    from accflow_tpu.convert.torch_weights import convert_state_dict
    from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_forward

    torch.manual_seed(3)
    model = RAFT(argparse.Namespace(small=False, mixed_precision=False)).train()
    i1, i2 = image_pair
    gt_t = torch.from_numpy(
        (3.0 * np.random.default_rng(11).standard_normal((1, 2, 128, 128)))
        .astype(np.float32)
    )
    flow_up = model(i1, i2, iters=4)
    loss_t = ((flow_up - gt_t) ** 2).mean()
    loss_t.backward()

    cfg = RAFTConfig(compute_dtype="float32", iters=4)
    template = init_raft(jax.random.PRNGKey(0), cfg)
    params = convert_state_dict(template, model.state_dict())
    ref_grads = convert_state_dict(template, _torch_grad_state(model))
    i1j, i2j, gt_j = nhwc(i1), nhwc(i2), nhwc(gt_t)

    def loss_fn(params):
        out = raft_forward(params, i1j, i2j, cfg, train=True)
        return ((out["flow_up"] - gt_j) ** 2).mean()

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=1e-4)
    _assert_tree_allclose(grads, ref_grads, rtol=2e-3, atol_frac=2e-3)


def test_gma_grad_parity(image_pair):
    """GMA fine-tune backward parity: adds the attention map, aggregate
    (+gamma residual) and GMA update block to the surfaces pinned by
    test_raft_grad_parity. Same squared-error-on-final-prediction loss."""
    import argparse
    from networks.gma.gma import RAFTGMA

    from accflow_tpu.convert.torch_weights import convert_state_dict
    from accflow_tpu.models.gma import GMAConfig, init_gma, gma_forward

    torch.manual_seed(5)
    model = RAFTGMA(
        argparse.Namespace(
            num_heads=1,
            mixed_precision=False,
            position_only=False,
            position_and_content=False,
        )
    ).train()
    i1, i2 = image_pair
    gt_t = torch.from_numpy(
        (3.0 * np.random.default_rng(17).standard_normal((1, 2, 128, 128)))
        .astype(np.float32)
    )
    flow_up = model(i1, i2, iters=4)
    loss_t = ((flow_up - gt_t) ** 2).mean()
    loss_t.backward()

    cfg = GMAConfig(compute_dtype="float32", iters=4)
    template = init_gma(jax.random.PRNGKey(0), cfg)
    params = convert_state_dict(template, model.state_dict())
    # allow_missing: the content-only branch registers but never touches
    # the RelPosEmb tables — zero grads on both sides.
    ref_grads = convert_state_dict(
        template, _torch_grad_state(model, allow_missing=True)
    )
    i1j, i2j, gt_j = nhwc(i1), nhwc(i2), nhwc(gt_t)

    def loss_fn(params):
        out = gma_forward(params, i1j, i2j, cfg, train=True)
        return ((out["flow_up"] - gt_j) ** 2).mean()

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=1e-4)
    _assert_tree_allclose(grads, ref_grads, rtol=2e-3, atol_frac=2e-3)


def test_accflow_grad_parity():
    """Backward-path parity for the accumulator training step: a per-step
    squared-error sequence loss on the accumulated outputs (the smooth
    stand-in for the reference's L1 sequence_loss_acc — see
    test_raft_grad_parity on why L1 grads are ill-posed to compare),
    grads w.r.t. the acc cell only (the OFE sits under no_grad upstream /
    stop_gradient here — AccFlow_.py:182, and both the carry and the
    occlusion maps are detached, AccFlow_.py:172,195,198). Torch model in
    eval() to match the frozen-BN OFE divergence documented in SURVEY
    §3.4."""
    import argparse
    from networks.raft.raft import RAFT
    from networks.AccFlow_ import AccFlow

    from accflow_tpu.convert.torch_weights import (
        convert_state_dict,
        split_accflow_state,
    )
    from accflow_tpu.models.accflow import (
        AccFlowConfig,
        accflow_forward,
        init_accflow,
    )
    from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_forward

    torch.manual_seed(4)
    ofe = RAFT(argparse.Namespace(small=False, mixed_precision=False)).eval()
    model = AccFlow(ofe).eval()
    model.mixed_precision = False

    rng = np.random.default_rng(13)
    frames_np = rng.uniform(-1, 1, (4, 1, 3, 128, 128)).astype(np.float32)
    gts_np = (3.0 * rng.standard_normal((2, 1, 2, 128, 128))).astype(np.float32)
    outs_t = model(images=[torch.from_numpy(f) for f in frames_np])
    loss_t = sum(
        ((o - torch.from_numpy(g)) ** 2).mean()
        for o, g in zip(outs_t, gts_np)
    )
    loss_t.backward()

    ofe_sd, acc_sd = split_accflow_state(model.state_dict())
    _, acc_grad_sd = split_accflow_state(
        _torch_grad_state(model, allow_missing=True)
    )
    rcfg = RAFTConfig(compute_dtype="float32", iters=12)
    ofe_params = convert_state_dict(init_raft(jax.random.PRNGKey(0), rcfg), ofe_sd)
    acfg = AccFlowConfig(compute_dtype="float32")
    acc_template = init_accflow(jax.random.PRNGKey(1), acfg)
    acc_params = convert_state_dict(acc_template, acc_sd)
    ref_grads = convert_state_dict(acc_template, acc_grad_sd)

    frames = jnp.asarray(np.moveaxis(frames_np, 2, -1))
    gts_j = jnp.asarray(np.moveaxis(gts_np, 2, -1))
    ofe_fn = lambda a, b: raft_forward(ofe_params, a, b, rcfg, final_only=True)["flow_up"]

    def loss_fn(acc_params):
        outs = accflow_forward(acc_params, ofe_fn, frames, acfg)
        return (((outs - gts_j) ** 2).mean(axis=(1, 2, 3, 4))).sum()

    loss_j, grads = jax.value_and_grad(loss_fn)(acc_params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=1e-3)
    _assert_tree_allclose(grads, ref_grads, rtol=5e-3, atol_frac=5e-3)


def test_fused_equals_stepwise_and_final_only():
    """The fused-OFE accumulation path and final_only estimator mode are
    pure restructurings — outputs must match their reference-shaped
    counterparts."""
    import numpy as np

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import (
        AccFlowConfig,
        accflow_forward,
        init_accflow,
    )

    rng = np.random.default_rng(3)
    est = build_flow_estimator("raft", compute_dtype="float32")
    ofe_params = est.init(jax.random.PRNGKey(0))
    frames = jnp.asarray(
        np.moveaxis(rng.uniform(-1, 1, (4, 1, 3, 128, 128)).astype(np.float32), 2, -1)
    )

    out_full = est.forward(ofe_params, frames[0], frames[1], iters=4)
    out_final = est.forward(ofe_params, frames[0], frames[1], iters=4, final_only=True)
    np.testing.assert_allclose(
        np.asarray(out_final["flow_up"]), np.asarray(out_full["flow_up"]),
        rtol=1e-5, atol=1e-5,
    )

    acc_params = init_accflow(jax.random.PRNGKey(1), AccFlowConfig())
    ofe_fn = lambda a, b: est.forward(ofe_params, a, b, iters=4, final_only=True)["flow_up"]
    cfg_fused = AccFlowConfig(compute_dtype="float32", fused_ofe=True)
    cfg_step = AccFlowConfig(compute_dtype="float32", fused_ofe=False)
    out_fused = accflow_forward(acc_params, ofe_fn, frames, cfg_fused)
    out_step = accflow_forward(acc_params, ofe_fn, frames, cfg_step)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_step), rtol=1e-4, atol=1e-4
    )


def test_accflow_forward_direction():
    """direction="forward" (the F0N ablation, upstream's broken
    networks/AccPlus_forward.py rebuilt on the active cell): at T=3 the
    forward recursion is EXACTLY backward accumulation on the reversed
    clip (identical cell call + identical OFE batching); at T=4 shapes."""
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import (
        AccFlowConfig,
        accflow_forward,
        init_accflow,
    )

    rng = np.random.default_rng(21)
    est = build_flow_estimator("raft", compute_dtype="float32")
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), AccFlowConfig())
    frames = jnp.asarray(
        np.moveaxis(rng.uniform(-1, 1, (4, 1, 3, 128, 128)).astype(np.float32), 2, -1)
    )
    ofe_fn = lambda a, b: est.forward(ofe_params, a, b, iters=4, final_only=True)["flow_up"]

    fwd3 = accflow_forward(
        acc_params, ofe_fn, frames[:3],
        AccFlowConfig(compute_dtype="float32", direction="forward"),
    )
    bwd3_rev = accflow_forward(
        acc_params, ofe_fn, frames[:3][::-1],
        AccFlowConfig(compute_dtype="float32", fused_ofe=False),
    )
    assert fwd3.shape == bwd3_rev.shape == (1, 1, 128, 128, 2)
    np.testing.assert_allclose(
        np.asarray(fwd3), np.asarray(bwd3_rev), rtol=1e-5, atol=1e-5
    )

    fwd4 = accflow_forward(
        acc_params, ofe_fn, frames,
        AccFlowConfig(compute_dtype="float32", direction="forward"),
    )
    assert fwd4.shape == (2, 1, 128, 128, 2)
    assert np.isfinite(np.asarray(fwd4)).all()

    # Fused F0N (default; hoisted OFE/context/emap/flow-encodes, cells-only
    # scan) == stepwise F0N, including the T>3 scan path.
    fwd4_step = accflow_forward(
        acc_params, ofe_fn, frames,
        AccFlowConfig(
            compute_dtype="float32", direction="forward", fused_ofe=False
        ),
    )
    np.testing.assert_allclose(
        np.asarray(fwd4), np.asarray(fwd4_step), rtol=1e-5, atol=1e-5
    )

    with pytest.raises(ValueError):
        accflow_forward(
            acc_params, ofe_fn, frames,
            AccFlowConfig(direction="forward", warm_start=True),
        )


def test_pairs_forward_equals_independent():
    """Deduplicated pair-batched estimator == independent pair forwards."""
    import numpy as np

    from accflow_tpu.models import build_flow_estimator

    rng = np.random.default_rng(5)
    for name in ("raft", "gma"):
        est = build_flow_estimator(name, compute_dtype="float32")
        params = est.init(jax.random.PRNGKey(0))
        frames = jnp.asarray(
            np.moveaxis(
                rng.uniform(-1, 1, (3, 2, 3, 128, 128)).astype(np.float32), 2, -1
            )
        )
        src, dst = (2, 2, 1), (1, 0, 0)
        flows = est.pairs_fn(params, iters=3)(frames, src, dst)
        for p, (s, d) in enumerate(zip(src, dst)):
            ref = est.forward(
                params, frames[s], frames[d], iters=3, final_only=True
            )["flow_up"]
            np.testing.assert_allclose(
                np.asarray(flows[2 * p : 2 * p + 2]), np.asarray(ref),
                rtol=1e-4, atol=1e-4, err_msg=f"{name} pair {p}",
            )


def test_fused_sep_gru_equals_reference():
    """The scan-hoisted/fused SepConvGRU must match the plain one."""
    import numpy as np

    from accflow_tpu.models.raft import (
        init_sep_conv_gru,
        make_fused_sep_gru,
        sep_conv_gru,
    )

    rng = np.random.default_rng(11)
    hd, idim, vdim = 128, 128, 256
    p = init_sep_conv_gru(jax.random.PRNGKey(0), hd, idim + vdim)
    h = jnp.asarray(rng.standard_normal((2, 8, 8, hd)).astype(np.float32))
    inp = jnp.asarray(rng.standard_normal((2, 8, 8, idim)).astype(np.float32))
    var = jnp.asarray(rng.standard_normal((2, 8, 8, vdim)).astype(np.float32))

    ref = sep_conv_gru(p, h, jnp.concatenate([inp, var], axis=-1))
    step = make_fused_sep_gru(p, inp, hd)
    out = step(h, var)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("branch", ["position_only", "position_and_content"])
def test_gma_positional_attention_parity(branch):
    """RelPosEmb branches vs networks/gma/modules.py (h != w to pin axis
    order)."""
    import argparse
    from networks.gma.modules import Attention

    from accflow_tpu.convert.torch_weights import convert_state_dict
    from accflow_tpu.models.gma import GMAConfig, attention, init_attention

    torch.manual_seed(3)
    args = argparse.Namespace(
        position_only=(branch == "position_only"),
        position_and_content=(branch == "position_and_content"),
    )
    model = Attention(args=args, dim=128, heads=1, max_pos_size=160, dim_head=128).eval()
    fmap = torch.randn(2, 128, 16, 24)
    with torch.no_grad():
        ref = model(fmap)

    cfg = GMAConfig(
        compute_dtype="float32",
        position_only=args.position_only,
        position_and_content=args.position_and_content,
    )
    template = init_attention(jax.random.PRNGKey(0), cfg)
    params = convert_state_dict(template, model.state_dict())
    ours = attention(params, jnp.asarray(_np(fmap).transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(ours), _np(ref), rtol=1e-5, atol=1e-6)


def test_raft_small_parity(image_pair):
    """Small RAFT variant (96/64 dims, r=3, ConvGRU, upflow8 upsampling)
    vs the reference torch model with converted weights
    (networks/raft/raft.py:30-34,49-57, update.py:62-112). No released
    checkpoint uses it, but the code path + converter mapping are pinned
    numerically here."""
    import argparse
    from networks.raft.raft import RAFT

    from accflow_tpu.convert.torch_weights import convert_state_dict
    from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_forward

    torch.manual_seed(1)
    model = RAFT(argparse.Namespace(small=True, mixed_precision=False)).eval()
    i1, i2 = image_pair
    with torch.no_grad():
        ref = model(i1, i2, iters=4)

    cfg = RAFTConfig(small=True, compute_dtype="float32", iters=4)
    template = init_raft(jax.random.PRNGKey(0), cfg)
    params = convert_state_dict(template, model.state_dict())
    out = raft_forward(params, nhwc(i1), nhwc(i2), cfg)

    ours = np.moveaxis(np.asarray(out["flow_up"]), -1, 1)
    np.testing.assert_allclose(ours, _np(ref), rtol=1e-3, atol=5e-3)


def test_raft_small_smoke():
    """The small RAFT variant (96/64 dims, r=3, ConvGRU, no learned
    upsampling mask) runs and produces sane shapes. No released checkpoint
    exercises it, so this pins the code path rather than golden values."""
    import numpy as np

    from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_forward

    cfg = RAFTConfig(small=True, compute_dtype="float32", iters=3)
    params = init_raft(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    i2 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    out = raft_forward(params, i1, i2, cfg)
    assert out["flow_up"].shape == (1, 64, 64, 2)
    assert out["predictions"].shape == (3, 1, 64, 64, 2)
    assert np.isfinite(np.asarray(out["flow_up"])).all()
    out_f = raft_forward(params, i1, i2, cfg, final_only=True)
    np.testing.assert_allclose(
        np.asarray(out_f["flow_up"]), np.asarray(out["flow_up"]), rtol=1e-5, atol=1e-5
    )


def test_evaluate_cvo_loads_pth_checkpoints(tmp_path):
    """End-to-end through evaluate_cvo's torch-checkpoint branches
    (train/evaluate.py ofe_ckpt/acc_ckpt paths) with saved random-init
    .pth files — the code path real released checkpoints take. batch=2
    over 3 samples also exercises the padded final eval batch."""
    import argparse

    from networks.AccFlow_ import AccFlow
    from networks.raft.raft import RAFT

    from accflow_tpu.data.synthetic import write_synthetic_cvor
    from accflow_tpu.train.evaluate import evaluate_cvo

    torch.manual_seed(9)
    ofe = RAFT(argparse.Namespace(small=False, mixed_precision=False)).eval()
    torch.save(ofe.state_dict(), tmp_path / "raft.pth")
    acc = AccFlow(ofe).eval()
    torch.save(acc.state_dict(), tmp_path / "acc_raft.pth")

    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=2, num_test=3, h=64, w=64)

    r1 = evaluate_cvo(
        "direct|raft", root, batch=2, iters=2,
        ofe_ckpt=str(tmp_path / "raft.pth"), compute_dtype="float32",
        result_file=str(tmp_path / "res.txt"),
    )
    assert all(np.isfinite(v) for v in r1.values())

    r2 = evaluate_cvo(
        "acc|raft", root, batch=2, iters=2,
        acc_ckpt=str(tmp_path / "acc_raft.pth"), compute_dtype="float32",
        result_file=str(tmp_path / "res.txt"),
    )
    assert all(np.isfinite(v) for v in r2.values())


def test_convert_ckpt_cli_roundtrip(tmp_path):
    """cli/convert_ckpt end-to-end: a saved torch RAFT .pth converts to
    .npz whose reloaded tree matches the direct converter output."""
    import argparse
    from networks.raft.raft import RAFT

    from accflow_tpu.cli.convert_ckpt import main as convert_main
    from accflow_tpu.convert.store import load_params
    from accflow_tpu.convert.torch_weights import convert_state_dict
    from accflow_tpu.models.raft import RAFTConfig, init_raft

    torch.manual_seed(2)
    model = RAFT(argparse.Namespace(small=False, mixed_precision=False)).eval()
    pth = str(tmp_path / "raft-test.pth")
    torch.save(model.state_dict(), pth)

    out = str(tmp_path / "raft-test.npz")
    convert_main(["--pth", pth, "--model", "raft", "--out", out])

    loaded = load_params(out)
    template = init_raft(jax.random.PRNGKey(0), RAFTConfig())
    direct = convert_state_dict(template, model.state_dict())
    flat_l = jax.tree_util.tree_leaves_with_path(loaded)
    flat_d = dict(jax.tree_util.tree_leaves_with_path(direct))
    assert len(flat_l) == len(flat_d)
    for path, leaf in flat_l:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_d[path]))


def test_npz_checkpoints_load_through_ckpt_paths(tmp_path):
    """Pre-converted .npz trees (cli.convert_ckpt output) load through the
    SAME --ofe_ckpt/--acc_ckpt paths as .pth files: the estimator loader
    takes the .npz directly, the acc loader takes the stem or either file
    of the pair, and mismatched trees fail with a clear error."""
    import argparse

    from networks.AccFlow_ import AccFlow
    from networks.raft.raft import RAFT

    from accflow_tpu.cli.convert_ckpt import main as convert_main
    from accflow_tpu.convert.torch_weights import (
        load_accflow_checkpoint,
        load_flow_estimator_checkpoint,
    )
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.models.raft import RAFTConfig, init_raft

    torch.manual_seed(3)
    ofe = RAFT(argparse.Namespace(small=False, mixed_precision=False)).eval()
    acc = AccFlow(ofe).eval()
    pth = str(tmp_path / "acc+raft-test.pth")
    torch.save(acc.state_dict(), pth)

    stem = str(tmp_path / "acc-raft-test")
    convert_main(["--pth", pth, "--model", "acc+raft", "--out", stem])

    ofe_template = init_raft(jax.random.PRNGKey(0), RAFTConfig())
    acc_template = init_accflow(jax.random.PRNGKey(1), AccFlowConfig())
    want_acc, want_ofe = load_accflow_checkpoint(pth, acc_template, ofe_template)

    for handle in (stem, stem + ".acc.npz", stem + ".ofe.npz"):
        got_acc, got_ofe = load_accflow_checkpoint(
            handle, acc_template, ofe_template
        )
        for a, b in zip(jax.tree.leaves(got_acc), jax.tree.leaves(want_acc)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(got_ofe), jax.tree.leaves(want_ofe)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the estimator .npz loads through the estimator path too
    got = load_flow_estimator_checkpoint(stem + ".ofe.npz", ofe_template)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want_ofe)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # mismatched template -> clear error, not a deep shape failure
    small_template = init_raft(jax.random.PRNGKey(0), RAFTConfig(small=True))
    with pytest.raises(ValueError, match="does not match|shape"):
        load_flow_estimator_checkpoint(stem + ".ofe.npz", small_template)
    with pytest.raises(FileNotFoundError, match="pair"):
        load_accflow_checkpoint(
            str(tmp_path / "nonexistent"), acc_template, ofe_template
        )
