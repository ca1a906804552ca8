"""Train-mode BatchNorm: torch parity, running-stat updates, buffer
masking, and SPMD consistency.

The reference fine-tunes RAFT/GMA with model.train()
(/root/reference/fine_tune.py:163), so the context encoder's
nn.BatchNorm2d (networks/raft/extractor.py:150-151) normalizes with batch
statistics and EMA-updates its running stats. These tests pin our
batch_norm(train=True) + collect/apply_bn_updates machinery against torch
and verify the optimizer never touches the running-stat buffers.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference"
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


def _np(t):
    return t.detach().cpu().numpy()


@needs_ref
def test_train_bn_matches_torch_encoder():
    """BasicEncoder train-mode forward + running-stat update vs torch,
    then an eval forward through the UPDATED (non-trivial) running stats —
    this also exercises the running_mean/running_var conversion path with
    values released checkpoints actually contain."""
    from networks.raft.extractor import BasicEncoder

    from accflow_tpu.convert.torch_weights import convert_state_dict
    from accflow_tpu.models.encoders import basic_encoder, init_basic_encoder
    from accflow_tpu.nn.layers import apply_bn_updates, collect_bn_updates

    torch.manual_seed(0)
    model = BasicEncoder(output_dim=128, norm_fn="batch", dropout=0.0)
    rng = np.random.default_rng(0)
    xs = [
        rng.uniform(-1, 1, (4, 3, 64, 64)).astype(np.float32) for _ in range(3)
    ]

    template = init_basic_encoder(jax.random.PRNGKey(0), 3, 128, "batch")
    params = convert_state_dict(template, model.state_dict())

    model.train()
    for i, x in enumerate(xs):
        with torch.no_grad():
            ref = model(torch.from_numpy(x))

        x_nhwc = jnp.asarray(np.moveaxis(x, 1, -1))
        ours = basic_encoder(params, x_nhwc, "batch", train=True)
        updates = collect_bn_updates(params)
        assert updates, "train-mode forward must stash BN updates"
        params = apply_bn_updates(params, updates)

        np.testing.assert_allclose(
            np.moveaxis(np.asarray(ours), -1, 1), _np(ref),
            rtol=1e-4, atol=1e-4, err_msg=f"train forward {i}",
        )

    # Running stats after 3 train steps must match torch's buffers.
    expected = convert_state_dict(template, model.state_dict())
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(expected)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    # Eval forward through the updated, non-trivial running stats.
    model.eval()
    with torch.no_grad():
        ref = model(torch.from_numpy(xs[0]))
    ours = basic_encoder(params, jnp.asarray(np.moveaxis(xs[0], 1, -1)), "batch")
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 1), _np(ref), rtol=1e-4, atol=1e-4
    )


@needs_ref
def test_raft_train_forward_matches_torch():
    """Full RAFT forward in train mode (model.train()) — the fine-tune
    loss path (fine_tune.py:163)."""
    import argparse
    from networks.raft.raft import RAFT

    from accflow_tpu.convert.torch_weights import convert_state_dict
    from accflow_tpu.models.raft import RAFTConfig, init_raft, raft_forward
    from accflow_tpu.nn.layers import collect_bn_updates

    torch.manual_seed(1)
    model = RAFT(argparse.Namespace(small=False, mixed_precision=False))
    model.train()
    rng = np.random.default_rng(1)
    i1 = rng.uniform(-1, 1, (2, 3, 128, 128)).astype(np.float32)
    i2 = rng.uniform(-1, 1, (2, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(i1), torch.from_numpy(i2), iters=4)

    cfg = RAFTConfig(compute_dtype="float32", iters=4)
    params = convert_state_dict(
        init_raft(jax.random.PRNGKey(0), cfg), model.state_dict()
    )
    out = raft_forward(
        params,
        jnp.asarray(np.moveaxis(i1, 1, -1)),
        jnp.asarray(np.moveaxis(i2, 1, -1)),
        cfg,
        train=True,
    )
    assert collect_bn_updates(params), "cnet BN updates must be stashed"
    # The committed reference forward returns only the final flow_up
    # (networks/raft/raft.py:94-146 — SURVEY.md §3.4 degeneracy).
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out["flow_up"]), -1, 1), _np(ref),
        rtol=1e-3, atol=5e-3,
    )


def test_bn_buffer_mask_freezes_running_stats():
    """AdamW weight decay must not shrink BN running stats (torch keeps
    them as buffers outside the optimizer)."""
    from accflow_tpu.nn.layers import bn_buffer_mask, init_batch_norm
    from accflow_tpu.train.optim import make_optimizer

    params = {
        "conv1": {"w": jnp.ones((3, 3, 4, 8)), "b": jnp.zeros((8,))},
        "norm1": init_batch_norm(8),
    }
    params["norm1"] = {
        **params["norm1"],
        "mean": jnp.full((8,), 0.5),
        "var": jnp.full((8,), 2.0),
    }
    mask = bn_buffer_mask(params)
    assert mask["norm1"]["mean"] is False and mask["norm1"]["var"] is False
    assert mask["norm1"]["scale"] is True and mask["conv1"]["w"] is True

    tx, _ = make_optimizer(1e-2, 100, wdecay=1e-2, buffer_mask=mask)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    import optax

    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    # Buffers untouched even with zero grads + weight decay; weights decayed.
    np.testing.assert_array_equal(np.asarray(new["norm1"]["mean"]), 0.5)
    np.testing.assert_array_equal(np.asarray(new["norm1"]["var"]), 2.0)
    assert float(jnp.abs(new["conv1"]["w"] - params["conv1"]["w"]).max()) > 0


def test_train_bn_sharded_equals_unsharded():
    """Batch statistics under a data-sharded pjit forward must equal the
    single-device result (GSPMD inserts the cross-device reductions)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from accflow_tpu.models.encoders import basic_encoder, init_basic_encoder
    from accflow_tpu.nn.layers import collect_bn_updates
    from accflow_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    if mesh.devices.size < 2:
        pytest.skip("needs multiple devices")

    params = init_basic_encoder(jax.random.PRNGKey(3), 3, 64, "batch")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))

    def fwd(p, x):
        out = basic_encoder(p, x, "batch", train=True)
        return out, collect_bn_updates(p)

    ref_out, ref_upd = jax.jit(fwd)(params, x)

    xs = jax.device_put(
        x, NamedSharding(mesh, P(mesh.axis_names[0], None, None, None))
    )
    sh_out, sh_upd = jax.jit(fwd)(params, xs)

    np.testing.assert_allclose(
        np.asarray(sh_out), np.asarray(ref_out), rtol=1e-4, atol=1e-4
    )
    for a, b in zip(jax.tree.leaves(sh_upd), jax.tree.leaves(ref_upd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
