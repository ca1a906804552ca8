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
from accflow_tpu.train.engine import to_clip, to_flow_seq


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
):
    """Run the CVO-{end} protocol. model_name: e.g. "direct|raft",
    "acc|gma" (test_cvo.py:118). Params may be passed directly (tests) or
    converted from .pth checkpoints. Returns dict of mean EPEs."""
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
        acfg = AccFlowConfig(compute_dtype=compute_dtype)
        acc_params = init_accflow(jax.random.PRNGKey(1), acfg)

    acfg = AccFlowConfig(compute_dtype=compute_dtype, ofe_iters=iters)

    @jax.jit
    def eval_batch(params_, acc_params_, imgs, bflows, fflows):
        images = to_clip(imgs, frames)[: end + 1]
        bseq = to_flow_seq(bflows)[: end - 1]
        fseq = to_flow_seq(fflows)[: end - 1]
        if use_acc:
            ofe_fn = lambda a, b: est.forward(
                params_, a, b, iters=iters, final_only=True
            )["flow_up"]
            fn0 = accflow_forward(
                acc_params_, ofe_fn, images, acfg,
                ofe_pairs=est.pairs_fn(params_, iters=iters),
            )[-1]
        else:
            fn0 = est.forward(
                params_, images[-1], images[0], iters=iters, final_only=True
            )["flow_up"]
        bmask, _ = calc_occ_mask(bseq[-1], fseq[-1])
        return cal_epe(fn0, bseq[-1], bmask)

    dst = fetch_valid_dataset(dataset_root, ["fflows", "bflows"], split=split)
    it = BatchIterator(dst, batch, shuffle=False, drop_last=False)

    alls, occs, viss = [], [], []
    for b in device_prefetch(iter(it), depth=2):
        epe_all, epe_occ, epe_vis = eval_batch(
            params, acc_params, b["imgs"], b["bflows"], b["fflows"]
        )
        alls.append(np.asarray(epe_all))
        occs.append(np.asarray(epe_occ))
        viss.append(np.asarray(epe_vis))

    result = {
        "all": float(np.mean(np.concatenate(alls))),
        "occ": float(np.mean(np.concatenate(occs))),
        "vis": float(np.mean(np.concatenate(viss))),
    }
    line = "AVG EPE %s: \nall:%.4f vis:%.4f occ:%.4f \n\n" % (
        model_name, result["all"], result["vis"], result["occ"],
    )
    print(line.strip())
    if result_file is None:
        result_file = f"test_result_{split}_E{end}.txt"
    with open(result_file, "a+") as f:
        f.write(line)
    return result
