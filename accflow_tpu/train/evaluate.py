"""CVO evaluation engine (reference test_cvo.py).

Protocol parity (BASELINE.md):
- CVO-6: flow frame `end`(=6) -> 0 on CVO-test clean/final, batch 10;
- direct: FN0 = estimator(imgs[end], imgs[0], 12 iters);
  acc: FN0 = AccFlow(images=imgs[:end+1])[-1];
- occlusion mask from bidirectional consistency of (bflows[end-2],
  fflows[end-2]) with thresh 0.01*(|f|+|b|)+0.5 (test_cvo.py:53-78);
- per-sample EPE all / occ / vis averaged over the dataset, appended to
  test_result_{split}_E{end}.txt (test_cvo.py:157-166).

The whole per-batch computation (normalize -> model -> occ mask -> EPE) is
one jitted program; batches stream through the device prefetcher.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from accflow_tpu.data.cvo import BatchIterator, fetch_valid_dataset
from accflow_tpu.data.prefetch import device_prefetch
from accflow_tpu.models import build_flow_estimator
from accflow_tpu.models.accflow import AccFlowConfig, accflow_forward, init_accflow
from accflow_tpu.ops.occlusion import calc_occ_mask
from accflow_tpu.parallel.mesh import host_array, is_main_process
from accflow_tpu.train.engine import pad_batch, to_clip, to_flow_seq


def cal_epe(pred, label, occ_mask):
    """Per-sample EPE all/occ/vis (test_cvo.py:81-101). NHWC inputs."""
    diff = jnp.sqrt(jnp.sum((pred - label) ** 2, axis=-1, keepdims=True))
    epe_all = diff.mean(axis=(1, 2, 3))

    def masked_mean(mask):
        denom = mask.sum(axis=(1, 2, 3))
        num = (diff * mask).sum(axis=(1, 2, 3))
        # Guard the 0/0 of a sample with an empty region (the reference
        # would produce nan there); report 0 instead.
        return jnp.where(denom > 0, num / jnp.maximum(denom, 1.0), 0.0)

    return epe_all, masked_mean(occ_mask), masked_mean(1.0 - occ_mask)


def evaluate_cvo(
    model_name: str,
    dataset_root: str,
    split: str = "clean",
    batch: int = 10,
    end: int = 6,
    iters: int = 12,
    acc_ckpt: Optional[str] = None,
    ofe_ckpt: Optional[str] = None,
    params=None,
    acc_params=None,
    compute_dtype: str = "bfloat16",
    result_file: Optional[str] = None,
    frames: int = 7,
    warm_start: bool = False,
    corr_lookup: str = "fused",
    micro_batch: Optional[int] = None,
    data_parallel: bool = True,
    scan_unroll: int = 1,
    attn_chunk: int = 0,
):
    """Run the CVO-{end} protocol. model_name: e.g. "direct|raft",
    "acc|gma" (test_cvo.py:118). Params may be passed directly (tests) or
    converted from .pth checkpoints. Returns dict of mean EPEs.

    micro_batch: per-device-call sub-batch. The reference's eval batch of
    10 at 512^2 needs ~17 GB of HBM for the f32 correlation volumes
    (XLA's lane padding included) and OOMs a 16 GB v5e, so batches are
    split into equal micro-batches for the compiled call while the
    METRIC aggregation still follows `batch` exactly. Default: the
    largest divisor of `batch` that is <= 8 (measured to fit at 512^2).

    data_parallel: when more than one device is visible and the device
    count divides micro_batch, each compiled call is SPMD batch-sharded
    over the data mesh (params replicated, samples split — the serving
    scale-out path; the reference's DataParallel equivalent at eval
    time). Metrics are unchanged; a single chip is a no-op.

    warm_start=True threads ops/warmstart.py inits across consecutive
    pairs — the reference README's TODO (/root/reference/README.md:11):
    acc mode warm-starts each accumulation step's OFE queries from the
    previous step's advected flows (AccFlowConfig.warm_start); direct mode
    estimates imgs[end] -> imgs[k] for k = end-1 .. 0, source-anchored, each
    initialized from the previous interval's 1/8-res flow. Both only change
    the estimator's iteration start, not the protocol.
    """
    use_acc = "acc" in model_name.split("|")[0]
    est = build_flow_estimator(
        model_name, compute_dtype=compute_dtype, corr_lookup=corr_lookup,
        scan_unroll=scan_unroll, attn_chunk=int(attn_chunk),
    )

    if params is None:
        template = est.init(jax.random.PRNGKey(0))
        if use_acc and acc_ckpt:
            from accflow_tpu.convert.torch_weights import load_accflow_checkpoint

            acfg = AccFlowConfig(compute_dtype=compute_dtype)
            acc_template = init_accflow(jax.random.PRNGKey(1), acfg)
            acc_params, params = load_accflow_checkpoint(acc_ckpt, acc_template, template)
        elif ofe_ckpt:
            from accflow_tpu.convert.torch_weights import load_flow_estimator_checkpoint

            params = load_flow_estimator_checkpoint(ofe_ckpt, template)
        else:
            params = template
    if use_acc and acc_params is None:
        acfg = AccFlowConfig(compute_dtype=compute_dtype)
        acc_params = init_accflow(jax.random.PRNGKey(1), acfg)

    acfg = AccFlowConfig(
        compute_dtype=compute_dtype, ofe_iters=iters, warm_start=warm_start
    )

    @jax.jit
    def eval_batch(params_, acc_params_, imgs, bflows, fflows):
        images = to_clip(imgs, frames)[: end + 1]
        bseq = to_flow_seq(bflows)[: end - 1]
        fseq = to_flow_seq(fflows)[: end - 1]
        if use_acc:
            ofe_fn = lambda a, b, flow_init=None: est.forward(
                params_, a, b, iters=iters, flow_init=flow_init,
                final_only=True,
            )["flow_up"]
            fn0 = accflow_forward(
                acc_params_, ofe_fn, images, acfg,
                ofe_pairs=est.pairs_fn(params_, iters=iters),
            )[-1]
        elif warm_start:
            # Source-anchored warm start: grow the interval end -> k,
            # initializing each solve from the previous interval's
            # 1/8-res flow (the query grid never moves, so no splat).
            out = est.forward(
                params_, images[-1], images[-2], iters=iters, final_only=True
            )
            for k in range(end - 2, -1, -1):
                out = est.forward(
                    params_, images[-1], images[k], iters=iters,
                    flow_init=out["flow_low"], final_only=True,
                )
            fn0 = out["flow_up"]
        else:
            fn0 = est.forward(
                params_, images[-1], images[0], iters=iters, final_only=True
            )["flow_up"]
        bmask, _ = calc_occ_mask(bseq[-1], fseq[-1])
        return cal_epe(fn0, bseq[-1], bmask)

    dst = fetch_valid_dataset(dataset_root, ["fflows", "bflows"], split=split)
    it = BatchIterator(dst, batch, shuffle=False, drop_last=False)

    if micro_batch is None:
        micro_batch = (
            batch if batch <= 8
            else max(d for d in range(1, 9) if batch % d == 0)
        )
    micro_batch = max(1, min(micro_batch, batch))
    # Round a user-supplied non-divisor down to the largest divisor of
    # `batch` so every micro-batch hits the ONE compiled shape (a ragged
    # trailing slice would cost an extra jit compile).
    while batch % micro_batch:
        micro_batch -= 1

    shard_in = None
    if data_parallel and len(jax.devices()) > 1:
        from accflow_tpu.parallel.mesh import (
            batch_sharding,
            make_mesh,
            shard_params,
        )

        mesh = make_mesh()
        if micro_batch % mesh.devices.size == 0:
            params = shard_params(mesh, params)
            if acc_params is not None:
                acc_params = shard_params(mesh, acc_params)
            shard_in = lambda v: jax.device_put(v, batch_sharding(mesh, v.ndim))

    alls, occs, viss = [], [], []
    for b in device_prefetch(iter(it), depth=2):
        # Pad the trailing partial batch (CVO-test: 536 % 10) so every
        # batch hits the ONE compiled shape; aggregate true counts only.
        b, n_valid = pad_batch(b, batch)
        for m0 in range(0, batch, micro_batch):
            if m0 >= n_valid:
                break
            mb = {k: v[m0 : m0 + micro_batch] for k, v in b.items()}
            if shard_in is not None:
                # device_put of the already-resident slice is a
                # device-to-device reshard — no host round trip.
                mb = {k: shard_in(v) for k, v in mb.items()}
            epe_all, epe_occ, epe_vis = eval_batch(
                params, acc_params, mb["imgs"], mb["bflows"], mb["fflows"]
            )
            nv = min(n_valid - m0, micro_batch)
            alls.append(host_array(epe_all)[:nv])
            occs.append(host_array(epe_occ)[:nv])
            viss.append(host_array(epe_vis)[:nv])

    result = {
        "all": float(np.mean(np.concatenate(alls))),
        "occ": float(np.mean(np.concatenate(occs))),
        "vis": float(np.mean(np.concatenate(viss))),
    }
    line = "AVG EPE %s: \nall:%.4f vis:%.4f occ:%.4f \n\n" % (
        model_name, result["all"], result["vis"], result["occ"],
    )
    # Process 0 owns the result file and console line (every process
    # computes identical global metrics; appending from all of them
    # would duplicate rows — test_cvo.py:157-166 is single-process).
    if is_main_process():
        print(line.strip())
        if result_file is None:
            result_file = f"test_result_{split}_E{end}.txt"
        with open(result_file, "a+") as f:
            f.write(line)
    return result


def evaluate_sequence(est, params, frames, iters: int = 12, warm_start: bool = True):
    """Consecutive-pair flows over a frame stream with upstream RAFT's
    warm start (reference networks/raft/utils/utils.py:31-63 semantics,
    on-device splat — ops/warmstart.py).

    frames: (T, N, H, W, 3) normalized to [-1, 1]. Returns
    (T-1, N, H, W, 2) float32 flows [f_{0->1}, ..., f_{T-2 -> T-1}]; each
    solve is initialized from the previous flow advected along itself
    (constant velocity), which upstream RAFT uses for Sintel sequences.
    """
    from accflow_tpu.ops.warmstart import forward_splat_flow

    t = frames.shape[0]
    out = est.forward(params, frames[0], frames[1], iters=iters, final_only=True)
    flows = [out["flow_up"]]
    for i in range(1, t - 1):
        init = forward_splat_flow(out["flow_low"]) if warm_start else None
        out = est.forward(
            params, frames[i], frames[i + 1], iters=iters,
            flow_init=init, final_only=True,
        )
        flows.append(out["flow_up"])
    return jnp.stack(flows, axis=0)


def evaluate_sintel(
    model_name: str,
    data_root: str,
    interv: int = 6,
    iters: int = 12,
    params=None,
    acc_params=None,
    ofe_ckpt: Optional[str] = None,
    acc_ckpt: Optional[str] = None,
    compute_dtype: str = "bfloat16",
    blacklist=(),
    result_file: Optional[str] = None,
    size=(1024, 436),
    batch: int = 4,
):
    """High-Speed Sintel evaluation over data/sintel.py (the reference
    ships the loader, data/dataset.py:164-236, but no engine — this is its
    consumer). Per sample the `43_imgs` high-FPS sequence subsampled at
    `interv` spans the original Sintel pair whose GT flow/occ mask are
    given; the long-range flow img0 -> img1 is estimated as:

    - "direct|...": one estimator call on the endpoint pair;
    - "acc|...":    AccFlow accumulation over the REVERSED subsampled
                    sequence (AccFlow accumulates frame i -> frame 0, so
                    reversing makes the final output img0 -> img1).

    The loader resizes every high-FPS sequence to the same `size`, so
    samples are batched `batch` at a time into ONE compiled shape (the
    trailing partial batch is padded by repetition and trimmed after);
    metrics are per-sample exactly as before.

    Reports EPE all / occ / noc (Sintel convention) averaged over samples.
    """
    from accflow_tpu.data.sintel import fetch_sintel_dataset
    from accflow_tpu.ops.padding import InputPadder

    use_acc = "acc" in model_name.split("|")[0]
    est = build_flow_estimator(model_name, compute_dtype=compute_dtype)
    if params is None:
        template = est.init(jax.random.PRNGKey(0))
        if use_acc and acc_ckpt:
            from accflow_tpu.convert.torch_weights import load_accflow_checkpoint

            acfg = AccFlowConfig(compute_dtype=compute_dtype)
            acc_template = init_accflow(jax.random.PRNGKey(1), acfg)
            acc_params, params = load_accflow_checkpoint(acc_ckpt, acc_template, template)
        elif ofe_ckpt:
            from accflow_tpu.convert.torch_weights import load_flow_estimator_checkpoint

            params = load_flow_estimator_checkpoint(ofe_ckpt, template)
        else:
            params = template
    if use_acc and acc_params is None:
        acc_params = init_accflow(
            jax.random.PRNGKey(1), AccFlowConfig(compute_dtype=compute_dtype)
        )
    acfg = AccFlowConfig(compute_dtype=compute_dtype, ofe_iters=iters)

    @jax.jit
    def eval_direct(params_, i1, i2):
        return est.forward(params_, i1, i2, iters=iters, final_only=True)["flow_up"]

    @jax.jit
    def eval_acc(params_, acc_params_, images):
        ofe_fn = lambda a, b: est.forward(
            params_, a, b, iters=iters, final_only=True
        )["flow_up"]
        return accflow_forward(
            acc_params_, ofe_fn, images, acfg,
            ofe_pairs=est.pairs_fn(params_, iters=iters),
        )[-1]

    dst = fetch_sintel_dataset(
        data_root, interv=interv, blacklist=blacklist, size=size
    )
    alls, occs, nocs = [], [], []
    padder = None
    pend_frames: list = []  # per-sample (T, Hp, Wp, 3) padded clips
    pend_meta: list = []  # per-sample (gt_flow, occ_bool)

    def flush():
        nonlocal pend_frames, pend_meta
        if not pend_meta:
            return
        n_valid = len(pend_meta)
        while len(pend_frames) < batch:  # pad the trailing partial batch
            pend_frames.append(pend_frames[-1])
        fb = jnp.asarray(np.stack(pend_frames, axis=1))  # (T, B, Hp, Wp, 3)
        if use_acc:
            flow = eval_acc(params, acc_params, fb[::-1])
        else:
            flow = eval_direct(params, fb[0], fb[-1])
        flow = np.asarray(padder.unpad(flow))
        for i, (gt, occ) in enumerate(pend_meta[:n_valid]):
            epe = np.sqrt(((flow[i] - gt) ** 2).sum(-1))
            alls.append(float(epe.mean()))
            occs.append(float(epe[occ].mean()) if occ.any() else 0.0)
            nocs.append(float(epe[~occ].mean()) if (~occ).any() else 0.0)
        pend_frames, pend_meta = [], []

    for idx in range(len(dst)):
        sample = dst.get(idx)
        hs = np.stack(sample["hs_sintel_imgs"], axis=0)  # (T, H, W, 3)
        frames = jnp.asarray(2.0 * (hs[:, None] / 255.0) - 1.0, jnp.float32)
        if padder is None:
            padder = InputPadder(frames.shape[-3:-1], mode="sintel")
        frames = jnp.stack([padder.pad(f)[0] for f in frames], axis=0)
        pend_frames.append(np.asarray(frames[:, 0]))
        pend_meta.append(
            (sample["gt_flow"], sample["occ_mask"][..., 0] > 0.5)
        )
        if len(pend_meta) == batch:
            flush()
    flush()

    result = {
        "all": float(np.mean(alls)),
        "occ": float(np.mean(occs)),
        "noc": float(np.mean(nocs)),
    }
    line = "AVG EPE sintel %s interv=%d: \nall:%.4f noc:%.4f occ:%.4f \n\n" % (
        model_name, interv, result["all"], result["noc"], result["occ"],
    )
    if is_main_process():
        print(line.strip())
        if result_file:
            with open(result_file, "a+") as f:
                f.write(line)
    return result
