"""Training stack tests on the 8-virtual-device CPU mesh: schedule parity
vs torch OneCycleLR, loss semantics, one real accumulator train step
(loss decreases over a few steps on learnable synthetic motion), and the
fine-tune task selector."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from accflow_tpu.train.loss import sequence_loss_acc, sequence_loss_raft
from accflow_tpu.train.optim import onecycle_linear


@pytest.mark.parametrize("total", [1000, 108])
def test_onecycle_matches_torch(total):
    # total=108 has a FRACTIONAL warmup boundary (0.05*108-1 = 4.4) —
    # the recipe's num_steps+100 totals usually do; torch interpolates
    # against the float boundary and so must we (caught by the N-step
    # trajectory parity test).
    lr = 1.2e-4
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=lr, total_steps=total, pct_start=0.05,
        cycle_momentum=False, anneal_strategy="linear",
    )
    ours = onecycle_linear(lr, total, 0.05)
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()
    ours_lrs = np.array([float(ours(i)) for i in range(total)])
    # rtol 1e-4: ours evaluates in f32 (jit-friendly); torch in f64.
    np.testing.assert_allclose(ours_lrs, np.array(torch_lrs), rtol=1e-4, atol=1e-11)


def test_sequence_loss_raft_matches_reference(rng):
    preds = rng.standard_normal((4, 2, 8, 8, 2)).astype(np.float32)
    gt = rng.standard_normal((2, 8, 8, 2)).astype(np.float32)
    loss, metrics = sequence_loss_raft(jnp.asarray(preds), jnp.asarray(gt), gamma=0.85)

    # reference loss.py:4-25 inline
    ref = 0.0
    for i in range(4):
        w = 0.85 ** (4 - i - 1)
        ref += w * np.abs(preds[i] - gt).mean()
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)
    epe = np.sqrt(((preds[-1] - gt) ** 2).sum(-1))
    np.testing.assert_allclose(float(metrics["epe"]), epe.mean(), rtol=1e-5)


def test_sequence_loss_acc_matches_reference(rng):
    preds = rng.standard_normal((5, 2, 8, 8, 2)).astype(np.float32)
    gts = rng.standard_normal((5, 2, 8, 8, 2)).astype(np.float32)
    loss, _ = sequence_loss_acc(jnp.asarray(preds), jnp.asarray(gts))
    ref = sum(np.abs(preds[i] - gts[i]).mean() for i in range(5))
    np.testing.assert_allclose(float(loss), ref, rtol=1e-5)


def test_select_pair_covers_all_tasks(rng):
    from accflow_tpu.train.finetune import select_pair

    batch = {
        "imgs": np.arange(2 * 4 * 4 * 21, dtype=np.float32).reshape(2, 4, 4, 21),
        "fflows": rng.standard_normal((2, 4, 4, 10)).astype(np.float32),
        "bflows": rng.standard_normal((2, 4, 4, 10)).astype(np.float32),
        "delta_fflows": rng.standard_normal((2, 4, 4, 12)).astype(np.float32),
        "delta_bflows": rng.standard_normal((2, 4, 4, 12)).astype(np.float32),
    }
    g = np.random.default_rng(0)
    seen = set()
    for _ in range(200):
        i1, i2, label = select_pair(batch, g)
        assert i1.shape == (2, 4, 4, 3) and label.shape == (2, 4, 4, 2)
        seen.add((float(i1[0, 0, 0, 0]), float(i2[0, 0, 0, 0])))
    assert len(seen) > 4  # local fwd/bwd + several cross-frame intervals


@pytest.mark.slow
def test_acc_train_step_decreases_loss(tmp_path):
    """Real end-to-end: synthetic translating clips, tiny RAFT-frozen
    AccFlow, 8-device data-parallel mesh, a few AdamW steps."""
    from accflow_tpu.data.synthetic import write_synthetic_cvor
    from accflow_tpu.train.engine import train_acc
    from accflow_tpu.utils.config import AttrDict

    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=8, num_test=2, h=64, w=64)

    opt = AttrDict(
        exp_name="Acc+RAFT-debug",
        epochs=1,
        lr=1e-4,
        wdecay=1e-5,
        epsilon=1e-8,
        compute_dtype="float32",
        batch_per_gpu=1,
        clip=1.0,
        add_noise=True,
        log_freq=1,
        valid_freq=4,
        image_size=64,
        dataset_root=root,
        log_dir=str(tmp_path / "logs"),
        ckpt_dir=str(tmp_path / "ckpt"),
        visual_samples=[0],
    )
    state = train_acc(opt, max_steps=2)
    assert int(state.step) == 2
    # params updated
    leaves = jax.tree.leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


@pytest.mark.slow
def test_finetune_step_runs(tmp_path):
    from accflow_tpu.data.synthetic import write_synthetic_cvor
    from accflow_tpu.train.finetune import fine_tune
    from accflow_tpu.utils.config import AttrDict

    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=8, num_test=2, h=64, w=64)
    opt = AttrDict(
        exp_name="RAFT-debug",
        epochs=1,
        lr=1e-4,
        wdecay=1e-5,
        epsilon=1e-8,
        compute_dtype="float32",
        batch_per_gpu=1,
        clip=1.0,
        add_noise=False,
        gamma=0.85,
        log_freq=1,
        valid_freq=2,
        valid_sample=1,
        image_size=64,
        dataset_root=root,
        log_dir=str(tmp_path / "logs"),
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    state = fine_tune(opt, max_steps=2)
    assert int(state.step) == 2


def test_finetune_step_runs_ondemand(tmp_path):
    """Fine-tuning backward-through-the-lookup also works in the
    volume-free corr mode (corr_lookup config knob)."""
    from accflow_tpu.data.synthetic import write_synthetic_cvor
    from accflow_tpu.train.finetune import fine_tune
    from accflow_tpu.utils.config import AttrDict

    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=4, num_test=2, h=64, w=64)
    opt = AttrDict(
        exp_name="RAFT-debug",
        epochs=1,
        lr=1e-4,
        wdecay=1e-5,
        epsilon=1e-8,
        compute_dtype="float32",
        batch_per_gpu=1,
        clip=1.0,
        add_noise=False,
        gamma=0.85,
        log_freq=1,
        valid_freq=10,
        valid_sample=1,
        image_size=64,
        dataset_root=root,
        corr_lookup="ondemand:16",
        log_dir=str(tmp_path / "logs"),
        ckpt_dir=str(tmp_path / "ckpt"),
    )
    state = fine_tune(opt, max_steps=1)
    assert int(state.step) == 1


@pytest.mark.slow
def test_accflow_remat_grads_match(rng):
    """remat=True must not change gradients (only memory)."""
    import jax.numpy as jnp

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import (
        AccFlowConfig,
        accflow_forward,
        init_accflow,
    )

    est = build_flow_estimator("raft", compute_dtype="float32")
    ofe_params = est.init(jax.random.PRNGKey(0))
    frames = jnp.asarray(
        rng.uniform(-1, 1, (4, 1, 64, 64, 3)).astype(np.float32)
    )
    ofe_fn = lambda a, b: est.forward(ofe_params, a, b, iters=2)["flow_up"]

    def loss(params, cfg):
        outs = accflow_forward(params, ofe_fn, frames, cfg)
        return jnp.abs(outs).mean()

    cfg0 = AccFlowConfig(compute_dtype="float32", remat=False)
    params = init_accflow(jax.random.PRNGKey(1), cfg0)
    g0 = jax.grad(loss)(params, cfg0)
    for remat in (True, "full", "dots"):
        cfg1 = AccFlowConfig(compute_dtype="float32", remat=remat)
        g1 = jax.grad(loss)(params, cfg1)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )


def test_scan_remat_grads_match(rng):
    """scan_remat=dots|full must not change the fine-tune gradients —
    jax.checkpoint on the GRU scan body only changes what the backward
    saves vs recomputes (models/raft.py::apply_scan_remat)."""
    import jax.numpy as jnp

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.train.loss import sequence_loss_raft

    img1 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    label = jnp.asarray(
        rng.uniform(-3, 3, (1, 64, 64, 2)).astype(np.float32)
    )

    for name in ("raft", "gma"):
        grads = {}
        for remat in ("none", "dots", "full"):
            est = build_flow_estimator(
                name, compute_dtype="float32", scan_remat=remat
            )
            params = est.init(jax.random.PRNGKey(0))

            def loss(p):
                out = est.forward(p, img1, img2, iters=3, train=True)
                l, _ = sequence_loss_raft(out["predictions"], label, 0.85)
                return l

            grads[remat] = jax.grad(loss)(params)
        for remat in ("dots", "full"):
            for a, b in zip(
                jax.tree.leaves(grads["none"]), jax.tree.leaves(grads[remat])
            ):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
                )


def test_train_acc_resume_auto(tmp_path):
    """Checkpoint/resume parity (train_acc.py:27-32,174-191): a second run
    with resume='auto' restores the latest state and continues counting."""
    from accflow_tpu.data.synthetic import write_synthetic_cvor
    from accflow_tpu.train.engine import train_acc
    from accflow_tpu.utils.config import AttrDict

    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=8, num_test=2, h=64, w=64)

    def opts(resume=None):
        return AttrDict(
            exp_name="Acc+RAFT-debug",
            epochs=2,
            lr=1e-4,
            wdecay=1e-5,
            epsilon=1e-8,
            compute_dtype="float32",
            batch_per_gpu=1,
            clip=1.0,
            add_noise=False,
            log_freq=1,
            valid_freq=100,
            image_size=64,
            dataset_root=root,
            log_dir=str(tmp_path / "logs"),
            ckpt_dir=str(tmp_path / "ckpt"),
            visual_samples=[],
            resume=resume,
            seed=3,
        )

    state1 = train_acc(opts(), max_steps=2)
    assert int(state1.step) == 2
    state2 = train_acc(opts(resume="auto"), max_steps=4)
    assert int(state2.step) == 4
    # resuming from the numbered step also works
    state3 = train_acc(opts(resume=2), max_steps=3)
    assert int(state3.step) == 3


def test_best_k_checkpoint_retention(tmp_path):
    """Retention parity (train_acc.py:268,279-301,311): `latest` every
    validation, numbered saves ONLY on new best EPE pruned oldest-first to
    keep-1, and non-improving validations never evict the best model."""
    import jax.numpy as jnp

    from accflow_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "ckpt"), keep=4)
    template = {"w": jnp.zeros((2,))}

    def state(step):
        return {"w": jnp.full((2,), float(step))}

    # 6 validations, non-monotone EPE; bests at steps 100, 200, 400, 500.
    epes = [5.0, 4.0, 4.5, 3.0, 2.5, 2.9]
    best = float("inf")
    for i, epe in enumerate(epes, start=1):
        step = 100 * i
        ckpt.save(step, state(step))
        if epe <= best:
            best = epe
            ckpt.save_best(step, state(step))

    # Oldest best (100) pruned; the best model (500) SURVIVES the
    # non-improving validation at 600.
    assert ckpt.best_steps() == [200, 400, 500]
    assert ckpt.latest_step() == 600

    restored = ckpt.restore(template, step=500)
    assert float(restored["w"][0]) == 500.0
    restored = ckpt.restore(template)  # auto -> latest
    assert float(restored["w"][0]) == 600.0

    ckpt.save_final(700, state(700))
    assert float(ckpt.restore(template)["w"][0]) == 700.0
    ckpt.close()


def test_finetune_validation_caps_by_samples():
    """The reference breaks validation AT batch-index == valid_sample with
    batch size 1 (fine_tune.py:262-279, configs/RAFT.yml:24) = 501
    samples; our batched pass must count SAMPLES, not batches, and trim
    the final batch's surplus."""
    import numpy as np

    from accflow_tpu.train.finetune import run_validation

    class FakeDataset:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def get(self, i, rng=None):
            return {
                "imgs": np.full((4, 4, 3), i % 251, np.uint8),
                "bflows": np.zeros((4, 4, 2), np.float32),
            }

    calls = []

    def fake_valid_step(params, imgs, bflows):
        calls.append(imgs.shape[0])
        return np.full((imgs.shape[0],), 2.0, np.float32), None

    epe, n = run_validation(
        fake_valid_step, None, FakeDataset(1000), batch=12,
        in_shard=lambda b: b, valid_sample=500,
    )
    assert n == 501  # reference: ids 0..500 inclusive at batch 1
    assert len(calls) == int(np.ceil(501 / 12))  # 42 batches, not 501
    assert abs(epe - 2.0) < 1e-6

    # Small dataset: cap never reached, every sample counted once.
    epe, n = run_validation(
        fake_valid_step, None, FakeDataset(30), batch=12,
        in_shard=lambda b: b, valid_sample=500,
    )
    assert n == 30


def test_train_acc_tb_and_visual_samples(tmp_path):
    """TBLogger wiring + per-SAMPLE visual dumps (train_acc.py:283-289):
    one training step with valid_freq=1 must (a) emit train/{loss,epe,lr}
    and val/epe through a provided tb logger, and (b) dump flow PNGs for
    the requested validation SAMPLE indices — including index 9, which
    lives in the SECOND validation batch at offset 1 (batch-indexed code,
    the round-2 bug, would miss it)."""
    from accflow_tpu.data.synthetic import write_synthetic_cvor
    from accflow_tpu.train.engine import train_acc
    from accflow_tpu.utils.config import AttrDict

    root = str(tmp_path / "cvor")
    # 10 test clips at validation batch 8 (1/device x 8 virtual devices)
    # -> two validation batches of true sizes 8 and 2.
    write_synthetic_cvor(root, num_train=8, num_test=10, h=64, w=64)

    class TBStub:
        def __init__(self):
            self.writes = []

        def write_dict(self, scalars, step=None):
            self.writes.append((dict(scalars), step))

        def close(self):
            pass

    tb = TBStub()
    opt = AttrDict(
        exp_name="Acc+RAFT-tbtest",
        epochs=1,
        lr=1e-4,
        wdecay=1e-5,
        epsilon=1e-8,
        compute_dtype="float32",
        batch_per_gpu=1,
        clip=1.0,
        add_noise=False,
        log_freq=1,
        valid_freq=1,
        image_size=64,
        dataset_root=root,
        log_dir=str(tmp_path / "logs"),
        ckpt_dir=str(tmp_path / "ckpt"),
        visual_samples=[0, 9],
        resume=None,
        seed=3,
    )
    train_acc(opt, max_steps=1, tb=tb)

    keys = set().union(*(set(s) for s, _ in tb.writes))
    assert {"train/loss", "train/epe", "train/lr", "val/epe"} <= keys

    import glob

    im0 = glob.glob(str(tmp_path / "logs" / "val" / "im000" / "*.png"))
    im9 = glob.glob(str(tmp_path / "logs" / "val" / "im009" / "*.png"))
    assert im0 and im9, (im0, im9)


def test_train_acc_forward_direction(tmp_path):
    """direction="forward" (F0N ablation) trains end-to-end: the engine
    switches labels to fflows [F_{0,k}] and the forward recursion runs
    under grad + AdamW on the 8-device mesh."""
    from accflow_tpu.data.synthetic import write_synthetic_cvor
    from accflow_tpu.train.engine import train_acc
    from accflow_tpu.utils.config import AttrDict

    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=8, num_test=2, h=64, w=64)

    opt = AttrDict(
        exp_name="Acc+RAFT-f0n-debug",
        direction="forward",
        epochs=1,
        lr=1e-4,
        wdecay=1e-5,
        epsilon=1e-8,
        compute_dtype="float32",
        batch_per_gpu=1,
        clip=1.0,
        add_noise=False,
        log_freq=1,
        valid_freq=100,
        image_size=64,
        dataset_root=root,
        log_dir=str(tmp_path / "logs"),
        ckpt_dir=str(tmp_path / "ckpt"),
        visual_samples=[],
    )
    state = train_acc(opt, max_steps=2)
    assert int(state.step) == 2
    leaves = jax.tree.leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_microbatched_value_and_grad_toy():
    """Helper exactness on a toy batch-mean loss: k micro-batches give the
    full-batch loss/aux/grads (train/accum.py), and non-dividing k is a
    clear error."""
    from accflow_tpu.train.accum import microbatched_value_and_grad

    def loss_fn(params, x, y):
        pred = x @ params["w"]
        loss = jnp.mean((pred - y) ** 2)
        return loss, {"mae": jnp.mean(jnp.abs(pred - y))}

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))}
    x = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))

    (l0, a0), g0 = microbatched_value_and_grad(loss_fn, 1)(params, x, y)
    for k in (2, 4, 8):
        (lk, ak), gk = jax.jit(microbatched_value_and_grad(loss_fn, k))(
            params, x, y
        )
        np.testing.assert_allclose(float(lk), float(l0), rtol=1e-6)
        np.testing.assert_allclose(float(ak["mae"]), float(a0["mae"]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(gk["w"]), np.asarray(g0["w"]), rtol=1e-5, atol=1e-6
        )
    with pytest.raises(ValueError, match="grad_accum=3"):
        jax.jit(microbatched_value_and_grad(loss_fn, 3))(params, x, y)


@pytest.mark.slow
def test_acc_train_step_grad_accum_matches_full(cpu_devices):
    """One accumulator train step with grad_accum=2 == the full-batch step:
    same loss/metrics and same updated params (the loss is a batch mean and
    the OFE is frozen, so micro-batching is exact up to summation order)."""
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.train.engine import TrainState, make_acc_train_step
    from accflow_tpu.train.optim import make_optimizer

    est = build_flow_estimator("raft", compute_dtype="float32", iters=2)
    acfg = AccFlowConfig(compute_dtype="float32")
    ofe_params = est.init(jax.random.PRNGKey(0))
    acc_params = init_accflow(jax.random.PRNGKey(1), acfg)
    tx, _ = make_optimizer(lr=1e-4, num_steps=10, wdecay=1e-5, clip=1.0)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 255, (4, 48, 48, 21)).astype(np.float32))
    bflows = jnp.asarray(rng.uniform(-5, 5, (4, 48, 48, 10)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    def run(grad_accum):
        step, _ = make_acc_train_step(est, acfg, tx, add_noise=True,
                                      grad_accum=grad_accum)
        state = TrainState(
            jax.tree.map(jnp.copy, acc_params), tx.init(acc_params),
            jnp.int32(0),
        )
        return step(state, ofe_params, imgs, bflows, key)

    s1, l1, m1 = run(1)
    s2, l2, m2 = run(2)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    np.testing.assert_allclose(float(m2["epe"]), float(m1["epe"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-6
        )


@pytest.mark.slow
def test_finetune_grad_accum_runs(tmp_path):
    """fine_tune with grad_accum=2 runs end-to-end (BN normalizes per
    micro-batch — reference DataParallel's per-GPU-slice semantics — so
    this is a behavioral smoke, not an exactness check)."""
    from accflow_tpu.data.synthetic import write_synthetic_cvor
    from accflow_tpu.train.finetune import fine_tune
    from accflow_tpu.utils.config import AttrDict

    root = str(tmp_path / "cvor")
    write_synthetic_cvor(root, num_train=8, num_test=2, h=64, w=64)
    opt = AttrDict(
        exp_name="RAFT-debug",
        epochs=1,
        lr=1e-4,
        wdecay=1e-5,
        epsilon=1e-8,
        compute_dtype="float32",
        batch_per_gpu=1,
        clip=1.0,
        add_noise=False,
        log_freq=1,
        valid_freq=4,
        image_size=64,
        dataset_root=root,
        log_dir=str(tmp_path / "logs"),
        ckpt_dir=str(tmp_path / "ckpt"),
        visual_samples=[0],
        grad_accum=2,
    )
    state = fine_tune(opt, max_steps=2)
    assert int(state.step) == 2
    assert all(
        np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(state.params)
    )


@pytest.mark.skipif(
    not __import__("os").path.isdir("/root/reference"),
    reason="reference tree not available",
)
def test_training_trajectory_parity():
    """N-step training-TRAJECTORY parity vs the actual torch trainer
    semantics (train_acc.py:206-236): same converted init, same fixed
    batches, AdamW(lr, wdecay, eps) + linear OneCycle(total=steps+100,
    pct_start=0.05) + clip_grad_norm(1.0) + L1 sequence_loss_acc, noise
    off — per-step losses and the final parameter DELTAS must track.

    The torch loop is rebuilt here from train_acc.py line-for-line
    (fetch_optimizer at train_acc.py:72-87; the update block at
    train_acc.py:206-236 with GradScaler disabled): the reference's
    optimizer sees model.parameters() but the OFE runs under no_grad
    (AccFlow_.py:183), so grad-less params are skipped by both AdamW and
    clip_grad_norm_ — equivalent to our frozen-OFE split. Torch model in
    eval() for the documented frozen-BN divergence (SURVEY §3.4);
    mixed_precision off, f32 both sides."""
    import argparse
    import sys

    sys.path.insert(0, __import__("os").path.dirname(__file__))
    import _torch_ref  # noqa: F401  (sys.path + DeformConv2d stand-in)
    from loss import sequence_loss_acc as sequence_loss_acc_torch
    from networks.AccFlow_ import AccFlow
    from networks.raft.raft import RAFT

    from accflow_tpu.convert.torch_weights import (
        convert_state_dict,
        split_accflow_state,
    )
    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig, init_accflow
    from accflow_tpu.train.engine import TrainState, make_acc_train_step
    from accflow_tpu.train.optim import make_optimizer

    steps, lr, wdecay, eps, clip = 8, 2e-4, 1e-5, 1e-8, 1.0
    # >=128^2: the reference corr pyramid reaches a 1x1 level below that
    # and its (W-1) grid normalization divides by zero (test_model_parity).
    frames, n, size = 4, 1, 128

    torch.manual_seed(11)
    ofe_t = RAFT(argparse.Namespace(small=False, mixed_precision=False))
    model = AccFlow(ofe_t).eval()
    model.mixed_precision = False
    for p in ofe_t.parameters():
        p.requires_grad_(False)
    # Nudge the zero-init deform OFFSET head (ZeroConv2d, AccFlow_.py:81)
    # off exact zero: with all offsets exactly 0, the bilinear sampler's
    # coordinate derivative sits on a subgradient boundary (left/right
    # limits differ at integer coords) that torch's grid_sample and our
    # gather formulation resolve differently — both valid descent, but
    # Adam amplifies the differing step-1 signs to full delta scale.
    # ~0.02 px offsets make the gradient well-defined and IDENTICAL; the
    # same perturbed weights are converted to the jax side below.
    with torch.no_grad():
        zc = model.accplus.conv2[4].conv
        gen = torch.Generator().manual_seed(123)
        zc.weight.add_(1e-3 * torch.randn(zc.weight.shape, generator=gen))
        zc.bias.add_(1e-3 * torch.randn(zc.bias.shape, generator=gen))

    # Fixed data: two batches cycled over the steps (uint8-range images,
    # smooth random "flows" as labels — trajectory parity needs identical
    # inputs, not meaningful motion).
    rng = np.random.default_rng(5)
    imgs_np = rng.integers(0, 256, (2, frames, n, size, size, 3)).astype(np.float32)
    gts_np = (4.0 * rng.standard_normal((2, frames - 2, n, size, size, 2))).astype(
        np.float32
    )

    # --- torch trajectory (train_acc.py loop, scaler disabled) ---
    optimizer = torch.optim.AdamW(
        [p for p in model.parameters() if p.requires_grad],
        lr=lr, weight_decay=wdecay, eps=eps,
    )
    scheduler = torch.optim.lr_scheduler.OneCycleLR(
        optimizer, max_lr=lr, total_steps=steps + 100, pct_start=0.05,
        cycle_momentum=False, anneal_strategy="linear",
    )
    init_sd = {k: v.detach().clone() for k, v in model.state_dict().items()}
    losses_t = []
    for s in range(steps):
        optimizer.zero_grad()
        images = [
            torch.from_numpy(2 * (imgs_np[s % 2, t] / 255.0) - 1).permute(0, 3, 1, 2)
            for t in range(frames)
        ]
        label = [
            torch.from_numpy(gts_np[s % 2, t]).permute(0, 3, 1, 2)
            for t in range(frames - 2)
        ]
        flows_pre = model(images=images, test_mode=False)
        loss, _ = sequence_loss_acc_torch(flows_pre, label)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), clip)
        optimizer.step()
        scheduler.step()
        losses_t.append(float(loss.detach()))

    # --- jax trajectory (train/engine.py step) from the SAME init ---
    ofe_sd, acc_sd = split_accflow_state(init_sd)
    _, acc_final_sd = split_accflow_state(model.state_dict())
    est = build_flow_estimator("raft", compute_dtype="float32")
    ofe_params = convert_state_dict(est.init(jax.random.PRNGKey(0)), ofe_sd)
    acfg = AccFlowConfig(compute_dtype="float32")
    acc_template = init_accflow(jax.random.PRNGKey(1), acfg)
    acc_params = convert_state_dict(acc_template, acc_sd)
    acc_final_ref = convert_state_dict(acc_template, acc_final_sd)

    tx, _ = make_optimizer(lr, num_steps=steps, wdecay=wdecay, epsilon=eps,
                           clip=clip)
    train_step, _ = make_acc_train_step(est, acfg, tx, add_noise=False)
    state = TrainState(acc_params, tx.init(acc_params), jnp.int32(0))
    acc_init = jax.tree.map(np.asarray, acc_params)

    losses_j = []
    key = jax.random.PRNGKey(0)
    for s in range(steps):
        imgs = jnp.asarray(
            np.moveaxis(imgs_np[s % 2], 0, 3).reshape(n, size, size, 3 * frames)
        )
        labels = jnp.asarray(
            np.moveaxis(gts_np[s % 2], 0, 3).reshape(n, size, size, 2 * (frames - 2))
        )
        state, loss, _ = train_step(state, ofe_params, imgs, labels, key)
        losses_j.append(float(loss))

    np.testing.assert_allclose(losses_j, losses_t, rtol=5e-3)

    # Final parameter DELTAS (init -> step 8) must track leaf-by-leaf.
    # atol comes from the GLOBAL delta scale: Adam normalizes per-element,
    # so leaves whose true gradient is f32 noise still random-walk at
    # ~1e-2 of the signal deltas — uncorrelated between implementations
    # by construction (same reasoning as _assert_tree_allclose in
    # test_model_parity, but post-optimizer the noise floor is relative
    # to the tree, not the leaf).
    delta_j = jax.tree.map(lambda a, b: np.asarray(a) - b, state.params, acc_init)
    delta_t = jax.tree.map(
        lambda a, b: np.asarray(a) - np.asarray(b), acc_final_ref, acc_params
    )
    g = max(
        float(np.abs(np.asarray(l)).max()) for l in jax.tree.leaves(delta_t)
    )
    # Element-wise comparison is noise-limited: Adam normalizes per
    # element, so elements whose true gradient is f32 noise (e.g. conv
    # weights under the detached binary occlusion mask) random-walk to a
    # few e-2 of the global delta scale, UNcorrelated between
    # implementations — measured: ~3% of accplus.conv2 elements land in
    # (2e-2, 5e-2)*g on either side. A real semantic divergence (wrong
    # schedule/clip/loss/optimizer) moves deltas at O(g) across the
    # board, so assert (a) the global delta vector matches in relative
    # L2, and (b) per leaf, the error tail stays at noise amplitude.
    num = sum(
        float(((np.asarray(a) - np.asarray(b)) ** 2).sum())
        for a, b in zip(jax.tree.leaves(delta_j), jax.tree.leaves(delta_t))
    )
    den = sum(float((np.asarray(b) ** 2).sum()) for b in jax.tree.leaves(delta_t))
    rel = (num / den) ** 0.5
    assert rel <= 5e-2, f"global param-delta relative L2 {rel:.3f} > 0.05"
    for (path, dj), dt in zip(
        jax.tree_util.tree_flatten_with_path(delta_j)[0],
        jax.tree_util.tree_leaves(delta_t),
    ):
        err = np.abs(np.asarray(dj) - np.asarray(dt))
        name = jax.tree_util.keystr(path)
        p999 = float(np.quantile(err, 0.999))
        # Caps in LR units: an element whose |pred-gt| crosses zero at
        # slightly different steps between implementations takes one
        # L1-sign-flipped Adam step (~2*max_lr — measured 4.0e-4 at
        # lr=2e-4 on a handful of conv4 elements; the p99.9 tail sits at
        # ~0.6*lr). 3*lr / 1*lr bound those without admitting systematic
        # divergence, which moves at O(8*lr) across whole leaves (and is
        # what the global-L2 check above measures — it caught the real
        # OneCycle fractional-boundary bug at 15%).
        assert p999 <= 1.5 * lr and err.max() <= 3.0 * lr, (
            f"param-delta tail at {name}: p99.9 {p999:.2e}, "
            f"max {err.max():.2e} vs global scale {g:.2e}, lr {lr:g}"
        )
