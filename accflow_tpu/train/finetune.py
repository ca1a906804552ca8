"""Estimator (RAFT/GMA) fine-tuning engine (reference fine_tune.py).

Recipe parity:
- data: CVO clean+final with all four flow-key groups (fine_tune.py:132);
- each step randomly picks one task — interval in [1,7), direction +/-1 —
  selecting (input pair, GT) among local fwd/bwd and cross-frame fwd/bwd
  flows (fine_tune.py:208-222);
- gamma-weighted sequence loss over the prediction sequence, gamma=0.85
  (restoring upstream semantics — the committed reference degenerates
  here, SURVEY.md §3.4);
- same noise aug / AdamW / OneCycle / clip as the accumulator recipe;
- validation: direct imgs[-1] -> imgs[0] flow with 20 iters vs bflows[-1],
  capped at valid_sample+1 SAMPLES (fine_tune.py:262-279 breaks at batch
  index == valid_sample with batch size 1).

The per-step task selection runs on host (a python RNG choosing which
channel slices to feed); the jitted SPMD step always sees identical
shapes, so there is exactly one compiled program.
"""

from __future__ import annotations

import os
import os.path as osp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from accflow_tpu.data.cvo import BatchIterator, fetch_train_dataset, fetch_valid_dataset
from accflow_tpu.data.prefetch import device_prefetch
from accflow_tpu.models import build_flow_estimator
from accflow_tpu.nn.layers import apply_bn_updates, bn_buffer_mask, collect_bn_updates
from accflow_tpu.train.accum import microbatched_value_and_grad
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
from accflow_tpu.train.engine import TrainState, pad_batch, reference_noise
from accflow_tpu.train.loss import sequence_loss_raft
from accflow_tpu.train.optim import make_optimizer
from accflow_tpu.utils.logging import Timer, get_timestamp, setup_logger

ALL_FLOW_KEYS = ["fflows", "bflows", "delta_fflows", "delta_bflows"]


def select_pair(batch, rng: np.random.Generator):
    """Random task selection (fine_tune.py:208-222) on raw channel-cat
    arrays. Returns (img1_u8, img2_u8, label_flow) slices."""
    imgs = batch["imgs"]

    def frame(i):
        return imgs[..., 3 * i : 3 * i + 3]

    def flow(key, i):
        return batch[key][..., 2 * i : 2 * i + 2]

    interval = int(rng.integers(1, 7))
    direction = int(rng.choice([-1, 1]))
    if interval * direction == 1:
        return frame(0), frame(1), flow("delta_fflows", 0)
    if interval * direction == -1:
        return frame(1), frame(0), flow("delta_bflows", 0)
    if direction == 1:
        return frame(0), frame(interval), flow("fflows", interval - 2)
    return frame(interval), frame(0), flow("bflows", interval - 2)


def make_finetune_step(est, tx, add_noise: bool, gamma: float,
                       grad_accum: int = 1):
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, img1, img2, label, key):
        i1 = 2.0 * (img1.astype(jnp.float32) / 255.0) - 1.0
        i2 = 2.0 * (img2.astype(jnp.float32) / 255.0) - 1.0
        if add_noise:
            noise = reference_noise(key, i1.shape)
            i1, i2 = i1 + noise, i2 + noise

        def loss_fn(params, i1, i2, label):
            # train=True: batch-stat BatchNorm, matching the reference's
            # model.train() fine-tuning (fine_tune.py:163). The cnet's
            # running-stat updates come out as a (non-differentiated) aux.
            out = est.forward(params, i1, i2, iters=12, train=True)
            loss, metrics = sequence_loss_raft(out["predictions"], label, gamma)
            return loss, (metrics, collect_bn_updates(params))

        # grad_accum > 1: averaged grads over k sequential micro-batches
        # (train/accum.py). BatchNorm normalizes per micro-batch — the
        # reference DataParallel's per-GPU-slice BN semantics — and the
        # averaged running-stat updates are EMA'd once per step.
        (loss, (metrics, bn_updates)), grads = microbatched_value_and_grad(
            loss_fn, grad_accum, axis=0
        )(state.params, i1, i2, label)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = apply_bn_updates(params, bn_updates)
        return TrainState(params, opt_state, state.step + 1), loss, metrics

    @jax.jit
    def valid_step(params, imgs, bflows):
        n_frames = imgs.shape[-1] // 3
        i1 = 2.0 * (imgs[..., 3 * (n_frames - 1) :].astype(jnp.float32) / 255.0) - 1.0
        i2 = 2.0 * (imgs[..., :3].astype(jnp.float32) / 255.0) - 1.0
        label = bflows[..., -2:]
        out = est.forward(params, i1, i2, iters=20)
        epe = jnp.sqrt(jnp.sum((out["flow_up"] - label) ** 2, axis=-1))
        return epe.mean(axis=(1, 2)), out["flow_up"]

    return train_step, valid_step


def run_validation(valid_step, state_params, valid_dst, batch, in_shard, valid_sample=500):
    """One validation pass, capped by SAMPLES: the reference validates at
    batch 1 and breaks AT id == valid_sample (fine_tune.py:262-279), i.e.
    after valid_sample + 1 samples — the final batch's surplus is trimmed
    so batching cannot inflate the pass. Returns (mean_epe, n_samples)."""
    epes_sum, epes_n = 0.0, 0
    cap = int(valid_sample) + 1
    vit = BatchIterator(valid_dst, batch, shuffle=False, drop_last=False)
    for vb in vit:
        vb, n_valid = pad_batch(vb, batch)
        vb = in_shard(vb)
        per_sample, _ = valid_step(state_params, vb["imgs"], vb["bflows"])
        n_use = min(n_valid, cap - epes_n)
        epes_sum += float(host_array(per_sample)[:n_use].sum())
        epes_n += n_use
        if epes_n >= cap:
            break
    return epes_sum / max(epes_n, 1), epes_n


def fine_tune(opt, max_steps: int | None = None, tb=None):
    """Fine-tune RAFT/GMA on CVO. opt mirrors configs/{RAFT,GMA}.yml plus
    dataset_root. Returns the final TrainState.

    tb: optional utils.tb.TBLogger (train/{loss,epe,lr} + val/epe scalars;
    `use_tb: true` in opt constructs one on log_dir)."""
    maybe_init_distributed()  # multi-host no-op unless env-triggered
    mesh = make_mesh()
    n_dev = mesh.devices.size
    batch = opt.batch_per_gpu * n_dev
    gamma = opt.get("gamma", 0.85)

    # Debug-name frequency override (train_acc.py:33-35).
    if "debug" in str(opt.exp_name).lower():
        opt["valid_freq"] = 10
        opt["log_freq"] = 1
    # Side-effect ownership: see train_acc (process 0 writes; checkpoint
    # calls are collective and stay on every process).
    main = is_main_process()
    log_dir = opt.get("log_dir", f"./logs/{opt.exp_name}")
    ckpt_dir = opt.get("ckpt_dir", f"./checkpoints/{opt.exp_name}")
    if opt.get("resume") is None and main:
        # Archive stale run dirs (train_acc.py:39-45) — logs AND checkpoints.
        for d in (log_dir, ckpt_dir):
            if osp.isdir(d):
                os.rename(d, d + "_archived_" + get_timestamp())
    sync_processes("archive_dirs")
    if main:
        os.makedirs(log_dir, exist_ok=True)
    logger = setup_logger("accflow_ft", log_dir, "finetune_" + opt.exp_name,
                          tofile=main)
    own_tb = tb is None and bool(opt.get("use_tb")) and main
    if own_tb:
        from accflow_tpu.utils.tb import TBLogger

        tb = TBLogger(osp.join(log_dir, "tb"))

    train_dst = fetch_train_dataset(
        opt.dataset_root, ALL_FLOW_KEYS, crop_size=opt.image_size, split="clean+final"
    )
    valid_dst = fetch_valid_dataset(opt.dataset_root, ["bflows"], split="clean")
    sample_per_epoch = len(train_dst) // batch + 1
    num_steps = sample_per_epoch * opt.epochs
    logger.info(
        "Fine-tune on %d samples, batch %d over %d device(s), %d total steps",
        len(train_dst), batch, n_dev, num_steps,
    )

    est = build_flow_estimator(
        opt.exp_name, compute_dtype=opt.get("compute_dtype", "bfloat16"),
        small=bool(opt.get("small", False)),
        scan_unroll=int(opt.get("scan_unroll", 1)),
        # dots: save matmul/conv outputs across the GRU scan, recompute the
        # elementwise glue in the backward — measured 17% faster than
        # XLA's stack-everything default on the fine-tune step (PARITY.md
        # "Fine-tune step trace"); gradients are exact
        # (tests/test_training.py::test_scan_remat_grads_match).
        scan_remat=opt.get("scan_remat", "dots"),
        corr_lookup=opt.get("corr_lookup", "fused"),
        attn_chunk=int(opt.get("attn_chunk", 0)),
    )
    if opt.get("init_params") is not None:
        params = opt.init_params
    elif opt.get("flow_pretrained"):
        from accflow_tpu.convert.torch_weights import load_flow_estimator_checkpoint

        params = load_flow_estimator_checkpoint(
            opt.flow_pretrained, est.init(jax.random.PRNGKey(0))
        )
        logger.info("Initialized from %s", opt.flow_pretrained)
    else:
        params = est.init(jax.random.PRNGKey(opt.get("seed", 0)))

    from accflow_tpu.utils.logging import count_parameters

    logger.info("Parameter Count: trainable: %d", count_parameters(params))
    # BN running stats are torch BUFFERS, not parameters — keep AdamW's
    # weight decay off them (they are updated by apply_bn_updates instead).
    tx, schedule = make_optimizer(
        opt.lr, num_steps, opt.wdecay, opt.epsilon, opt.clip,
        buffer_mask=bn_buffer_mask(params),
    )
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    state = shard_params(mesh, state)
    in_shard = lambda b: {
        k: jax.device_put(v, batch_sharding(mesh, v.ndim)) for k, v in b.items()
    }

    train_step, valid_step = make_finetune_step(
        est, tx, opt.add_noise, gamma,
        grad_accum=int(opt.get("grad_accum", 1)),
    )
    ckpt = CheckpointManager(ckpt_dir, keep=4)
    current_step = 0
    if opt.get("resume") is not None:
        # "auto" -> latest saved step; an int -> that numbered checkpoint
        # (train_acc.py:27-32 semantics).
        step = None if str(opt.resume) == "auto" else int(opt.resume)
        state = ckpt.restore(state, step=step)
        current_step = int(state.step)

    key = jax.random.PRNGKey(opt.get("seed", 0) + 1)
    host_rng = np.random.default_rng(opt.get("seed", 0) + 2)
    timer = Timer()
    losses, epes = [], []
    best_val_epe = 1e10
    best_val_step = current_step
    stop = False

    for epoch in range(current_step // sample_per_epoch, opt.epochs):
        if stop:
            break
        it = BatchIterator(
            train_dst, batch, shuffle=True, drop_last=True,
            seed=opt.get("seed", 0), epoch=epoch,
        )
        timer.tick()
        for batch_np in device_prefetch(iter(it), depth=2, transform=in_shard):
            current_step += 1
            img1, img2, label = select_pair(batch_np, host_rng)
            key, sub = jax.random.split(key)
            state, loss, metrics = train_step(state, img1, img2, label, sub)
            losses.append(float(loss))
            epes.append(float(metrics["epe"]))
            timer.tick()

            if current_step % opt.log_freq == 0 or current_step < 25:
                avg_time = timer.get_average_and_reset()
                avg_loss = sum(losses) / len(losses)
                avg_epe = sum(epes) / len(epes)
                lr_now = float(schedule(current_step))
                logger.info(
                    "<epoch:%2d, iter:%6d, t:%.2fs, loss:%.3f, epe:%.3f, lr:%.2e>",
                    epoch, current_step, avg_time, avg_loss, avg_epe, lr_now,
                )
                if tb is not None:
                    tb.write_dict(
                        {"train/loss": avg_loss, "train/epe": avg_epe, "train/lr": lr_now},
                        current_step,
                    )
                losses, epes = [], []

            if current_step % opt.valid_freq == 0 or current_step == num_steps - 1:
                epe, _ = run_validation(
                    valid_step, state.params, valid_dst, batch, in_shard,
                    opt.get("valid_sample", 500),
                )
                ckpt.save(current_step, state)  # `latest` (fine_tune.py:285)
                if epe <= best_val_epe:
                    best_val_epe, best_val_step = epe, current_step
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

    ckpt.save_final(max(current_step, 1), state)
    ckpt.close()
    if own_tb:
        tb.close()
    logger.info("Finish fine-tuning")
    return state
