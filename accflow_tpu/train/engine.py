"""Accumulator training engine (reference train_acc.py).

Recipe parity (configs/AccRAFT*.yml, train_acc.py):
- data: CVO clean+final, keys=["bflows"], random 256^2 crop, batch
  batch_per_gpu * n_devices, shuffle, drop_last;
- frozen OFE loaded from flow_pretrained, AccFlow modules trained;
- AdamW(lr, wdecay, eps) + linear OneCycle over num_steps+100, grad clip
  1.0, per-step noise augmentation (train_acc.py:216-220 — including its
  clamp-to-[0,255]-then-renormalize quirk, reproduced faithfully);
- periodic validation on CVO-test clean, latest + best-k checkpointing,
  qualitative flow PNG dumps of the best validation samples.

TPU mapping: the whole step (preprocess -> 5-step accumulation ->
loss -> grads -> AdamW update) is ONE jitted SPMD program over the device
mesh; batches arrive batch-sharded (data parallel), params replicated,
gradient psums inserted by the compiler. bf16 compute replaces torch AMP —
no GradScaler needed (bf16 has fp32-range exponents).
"""

from __future__ import annotations

import os
import os.path as osp
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from accflow_tpu.data.cvo import BatchIterator, fetch_train_dataset, fetch_valid_dataset
from accflow_tpu.data.prefetch import device_prefetch
from accflow_tpu.models import build_flow_estimator
from accflow_tpu.models.accflow import AccFlowConfig, accflow_forward, init_accflow
from accflow_tpu.parallel.mesh import (
    batch_sharding,
    host_array,
    is_main_process,
    make_mesh,
    maybe_init_distributed,
    shard_params,
    sync_processes,
)
from accflow_tpu.train.checkpoint import CheckpointManager
from accflow_tpu.train.accum import microbatched_value_and_grad
from accflow_tpu.train.loss import sequence_loss_acc
from accflow_tpu.train.optim import make_optimizer
from accflow_tpu.utils.logging import Timer, get_timestamp, setup_logger


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def to_clip(imgs: jnp.ndarray, frames: int | None = None) -> jnp.ndarray:
    """(N, H, W, 3*T) uint8/float -> (T, N, H, W, 3) in [-1, 1]
    (preprocess normalization, train_acc.py:62). frames, if given, asserts
    the clip length (the CVO protocol's 7); None infers T from C/3."""
    n, h, w, c = imgs.shape
    t = c // 3
    assert c % 3 == 0 and (frames is None or t == frames), (t, frames)
    x = imgs.astype(jnp.float32)
    x = 2.0 * (x / 255.0) - 1.0
    x = x.reshape(n, h, w, t, 3)
    return jnp.moveaxis(x, 3, 0)


def to_flow_seq(flows: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 2*S) -> (S, N, H, W, 2) (preprocess split, train_acc.py:59)."""
    n, h, w, c = flows.shape
    s = c // 2
    x = flows.reshape(n, h, w, s, 2)
    return jnp.moveaxis(x, 3, 0)


def reference_noise(key: jax.Array, frame_shape) -> jnp.ndarray:
    """train_acc.py:216-220, reproduced exactly: stdv ~ U[0,5), gaussian
    noise clamped to [0, 255] then renormalized with 2x/255-1 (NOTE: this
    shifts the baseline by -1 and keeps only the positive noise lobe —
    faithful to the reference, which trained its released checkpoints
    this way)."""
    k1, k2 = jax.random.split(key)
    stdv = jax.random.uniform(k1) * 5.0
    noise = stdv * jax.random.normal(k2, frame_shape, jnp.float32)
    return 2.0 * (jnp.clip(noise, 0.0, 255.0) / 255.0) - 1.0


def build_acc_model(opt):
    """(estimator, acc_cfg) from an experiment name like Acc+RAFT-cvo.
    opt.direction="forward" selects the F0N ablation (fflows labels)."""
    cd = opt.get("compute_dtype", "bfloat16")
    est = build_flow_estimator(
        opt.exp_name, compute_dtype=cd,
        small=bool(opt.get("small", False)),
        scan_unroll=int(opt.get("scan_unroll", 1)),
        corr_lookup=opt.get("corr_lookup", "fused"),
        attn_chunk=int(opt.get("attn_chunk", 0)),
    )
    acfg = AccFlowConfig(
        compute_dtype=cd,
        hidden=int(opt.get("acc_hidden", 128)),
        remat=opt.get("remat", False),  # False | "full"/true | "dots"
        direction=opt.get("direction", "backward"),
    )
    return est, acfg


def make_acc_train_step(est, acfg: AccFlowConfig, tx, add_noise: bool,
                        grad_accum: int = 1):
    def ofe_fn(ofe_params):
        def fn(i1, i2):
            return est.forward(ofe_params, i1, i2, final_only=True)["flow_up"]
        return fn

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, ofe_params, imgs, label_flows, key):
        # label_flows: bflows [F_{k,0}] (backward) or fflows [F_{0,k}]
        # (direction="forward") — both align with accflow_forward's output
        # list for their direction.
        images = to_clip(imgs)
        labels = to_flow_seq(label_flows)
        if add_noise:
            images = images + reference_noise(key, images.shape[1:])[None]

        def loss_fn(params, images, labels):
            outs = accflow_forward(
                params, ofe_fn(ofe_params), images, acfg,
                ofe_pairs=est.pairs_fn(ofe_params),
            )
            return sequence_loss_acc(outs, labels)

        # grad_accum > 1: k sequential micro-batches (batch axis 1 of the
        # (T, N, ...) clip), averaged grads — exact for this batch-mean
        # loss (train/accum.py).
        (loss, metrics), grads = microbatched_value_and_grad(
            loss_fn, grad_accum, axis=1
        )(state.params, images, labels)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        return new_state, loss, metrics

    @jax.jit
    def valid_step(params, ofe_params, imgs, label_flows):
        images = to_clip(imgs)
        labels = to_flow_seq(label_flows)
        outs = accflow_forward(
            params, ofe_fn(ofe_params), images, acfg,
            ofe_pairs=est.pairs_fn(ofe_params),
        )
        # Per-sample EPE of the last accumulated flow, so the engine can
        # aggregate correctly across padded validation batches.
        epe = jnp.sqrt(jnp.sum((outs[-1] - labels[-1]) ** 2, axis=-1))
        per_sample_epe = epe.mean(axis=(1, 2))
        return per_sample_epe, outs[-1]

    return train_step, valid_step


def pad_batch(batch: dict, size: int):
    """Pad a host batch dict to `size` samples by repeating the last sample
    (keeps SPMD batch shapes static). Returns (padded, n_valid)."""
    n = next(iter(batch.values())).shape[0]
    if n == size:
        return batch, n
    pad = size - n
    out = {
        k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
        for k, v in batch.items()
    }
    return out, n


def save_flow_png(flow_nhwc: np.ndarray, path: str) -> None:
    from PIL import Image

    from accflow_tpu.utils.flow_viz import flow_to_image

    os.makedirs(osp.dirname(path), exist_ok=True)
    Image.fromarray(flow_to_image(np.asarray(flow_nhwc[0]))).save(path)


def train_acc(opt, max_steps: int | None = None, tb=None):
    """Train the AccFlow accumulator. `opt` mirrors configs/Acc*.yml plus
    `dataset_root` (CVOR data) and optional `ofe_params`/`flow_pretrained`.
    max_steps truncates for smoke tests. Returns the final TrainState.

    tb: optional utils.tb.TBLogger — receives train/{loss,epe,lr} at every
    log point and val/epe at every validation (the reference ships the same
    wrapper but leaves it commented out, utils/util.py:156-172 /
    train_acc.py:127; pass `use_tb: true` in opt to construct one on
    log_dir)."""
    maybe_init_distributed()  # multi-host no-op unless env-triggered
    mesh = make_mesh()
    n_dev = mesh.devices.size
    batch = opt.batch_per_gpu * n_dev
    # Host-side side effects (archiving, log files, PNGs, TB) belong to
    # process 0 only; orbax checkpoint calls stay on every process (they
    # are collective). Single-process this is all a no-op.
    main = is_main_process()

    # Debug-name frequency override (train_acc.py:33-35).
    if "debug" in str(opt.exp_name).lower():
        opt["valid_freq"] = 10
        opt["log_freq"] = 1
    log_dir = opt.get("log_dir", f"./logs/{opt.exp_name}")
    ckpt_dir = opt.get("ckpt_dir", f"./checkpoints/{opt.exp_name}")
    if opt.get("resume") is None and main:
        # Archive stale run dirs (train_acc.py:39-45) — logs AND checkpoints.
        for d in (log_dir, ckpt_dir):
            if osp.isdir(d):
                os.rename(d, d + "_archived_" + get_timestamp())
    sync_processes("archive_dirs")  # dirs settled before anyone writes
    if main:
        os.makedirs(log_dir, exist_ok=True)
    logger = setup_logger("accflow", log_dir, "train_" + opt.exp_name,
                          tofile=main)
    own_tb = tb is None and bool(opt.get("use_tb")) and main
    if own_tb:
        from accflow_tpu.utils.tb import TBLogger

        tb = TBLogger(osp.join(log_dir, "tb"))

    # Backward accumulation (the paper's model) trains against bflows
    # [F_{k,0}]; the forward (F0N) ablation against fflows [F_{0,k}] —
    # the CVO groups align 1:1 with the respective output lists.
    flow_key = "fflows" if opt.get("direction") == "forward" else "bflows"
    train_dst = fetch_train_dataset(
        opt.dataset_root, [flow_key], crop_size=opt.image_size, split="clean+final"
    )
    valid_dst = fetch_valid_dataset(opt.dataset_root, [flow_key], split="clean")
    sample_per_epoch = len(train_dst) // batch + 1
    num_steps = sample_per_epoch * opt.epochs
    logger.info(
        "Train on %d samples, batch %d over %d device(s), %d iters/epoch, %d total",
        len(train_dst), batch, n_dev, sample_per_epoch, num_steps,
    )

    # Frozen OFE + trainable accumulator.
    est, acfg = build_acc_model(opt)
    if opt.get("ofe_params") is not None:
        ofe_params = opt.ofe_params
    elif opt.get("flow_pretrained"):
        from accflow_tpu.convert.torch_weights import load_flow_estimator_checkpoint

        template = est.init(jax.random.PRNGKey(0))
        ofe_params = load_flow_estimator_checkpoint(opt.flow_pretrained, template)
        logger.info("Loaded frozen OFE from %s", opt.flow_pretrained)
    else:
        ofe_params = est.init(jax.random.PRNGKey(0))
        logger.info("WARNING: frozen OFE uses random init (no flow_pretrained)")

    params = init_accflow(jax.random.PRNGKey(opt.get("seed", 0)), acfg)
    from accflow_tpu.utils.logging import count_parameters

    logger.info(
        "Parameter Count: trainable: %d, frozen (OFE): %d",
        count_parameters(params), count_parameters(ofe_params),
    )
    tx, schedule = make_optimizer(
        opt.lr, num_steps, opt.wdecay, opt.epsilon, opt.clip
    )
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    # Replicate params, shard batches over the mesh.
    state = shard_params(mesh, state)
    ofe_params = shard_params(mesh, ofe_params)
    in_shard = lambda b: {
        k: jax.device_put(v, batch_sharding(mesh, v.ndim)) for k, v in b.items()
    }

    train_step, valid_step = make_acc_train_step(
        est, acfg, tx, opt.add_noise,
        grad_accum=int(opt.get("grad_accum", 1)),
    )
    ckpt = CheckpointManager(ckpt_dir, keep=4)

    current_step = 0
    if opt.get("resume") is not None:
        # resume semantics (train_acc.py:27-32): "auto" -> latest saved
        # step; an int -> that specific numbered checkpoint.
        step = None if str(opt.resume) == "auto" else int(opt.resume)
        state = ckpt.restore(state, step=step)
        current_step = int(state.step)
        logger.info("Resumed from step %d", current_step)

    key = jax.random.PRNGKey(opt.get("seed", 0) + 1)
    timer = Timer()
    losses, epes = [], []
    best_val_epe = 1e10
    best_val_step = current_step
    start_epoch = current_step // sample_per_epoch
    stop = False

    for epoch in range(start_epoch, opt.epochs):
        if stop:
            break
        it = BatchIterator(
            train_dst, batch, shuffle=True, drop_last=True,
            seed=opt.get("seed", 0), epoch=epoch,
        )
        timer.tick()
        for batch_np in device_prefetch(iter(it), depth=2, transform=in_shard):
            current_step += 1
            key, sub = jax.random.split(key)
            state, loss, metrics = train_step(
                state, ofe_params, batch_np["imgs"], batch_np[flow_key], sub
            )
            losses.append(float(loss))
            epes.append(float(metrics["epe"]))
            timer.tick()

            if current_step % opt.log_freq == 0 or current_step < 25:
                avg_time = timer.get_average_and_reset()
                eta_h = avg_time * (num_steps - current_step) / 3600
                avg_loss = sum(losses) / len(losses)
                avg_epe = sum(epes) / len(epes)
                lr_now = float(schedule(current_step))
                logger.info(
                    "<epoch:%2d, iter:%6d, t:%.2fs, eta:%.2fh, loss:%.3f, epe:%.3f, lr:%.2e>",
                    epoch, current_step, avg_time, eta_h, avg_loss, avg_epe, lr_now,
                )
                if tb is not None:
                    tb.write_dict(
                        {"train/loss": avg_loss, "train/epe": avg_epe, "train/lr": lr_now},
                        current_step,
                    )
                losses, epes = [], []

            if current_step % opt.valid_freq == 0 or current_step == num_steps - 1:
                epes_sum, epes_n = 0.0, 0
                # visual_samples indexes SAMPLES of the validation set
                # (train_acc.py:283-289 dumps dataset sample i, not batch i).
                visual = sorted(set(opt.get("visual_samples", [])))
                val_last = {}
                vit = BatchIterator(valid_dst, batch, shuffle=False, drop_last=False)
                for vid, vb in enumerate(vit):
                    vb, n_valid = pad_batch(vb, batch)
                    vb = in_shard(vb)
                    per_sample, flow_last = valid_step(
                        state.params, ofe_params, vb["imgs"], vb[flow_key]
                    )
                    epes_sum += float(host_array(per_sample)[:n_valid].sum())
                    base = epes_n
                    epes_n += n_valid
                    want = [i for i in visual if base <= i < base + n_valid]
                    if want:
                        flow_np = host_array(flow_last)
                        for i in want:
                            val_last[i] = flow_np[i - base : i - base + 1]
                epe = epes_sum / max(epes_n, 1)
                ckpt.save(current_step, state)  # `latest` (train_acc.py:268)
                if epe <= best_val_epe:
                    best_val_epe, best_val_step = epe, current_step
                    for index in visual:
                        if main and index in val_last:
                            save_flow_png(
                                val_last[index],
                                osp.join(log_dir, "val/im%03d/%06d.png" % (index, current_step)),
                            )
                    # Numbered best-EPE save, pruned oldest-first
                    # (train_acc.py:291-301).
                    ckpt.save_best(current_step, state)
                logger.info(
                    "Validation EPE: %.3f, best: %.3f (step %d)",
                    epe, best_val_epe, best_val_step,
                )
                if tb is not None:
                    tb.write_dict({"val/epe": epe}, current_step)

            if max_steps is not None and current_step >= max_steps:
                stop = True
                break

    ckpt.save_final(max(current_step, 1), state)  # final.pth (train_acc.py:311)
    ckpt.close()
    if own_tb:
        tb.close()
    logger.info("Finish training")
    return state
