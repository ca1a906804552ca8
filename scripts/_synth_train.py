"""Shared train-on-synthetic recipe for quality benches (bench_stream
QUALITY=1, bench_drift): write a synthetic CVOR set, fine-tune the OFE on
it, then train the accumulator with the OFE frozen — so EPE tables
reflect a converging model, not random init (no released reference
checkpoints exist in this environment; see PARITY.md "Real-data parity").

Restartable: pass reuse=True with an existing tmp dir to skip data
synthesis and resume both trainings from their checkpoints (the
remote-compile relay occasionally drops long runs).
"""

import os

from accflow_tpu.data.synthetic import write_synthetic_cvor
from accflow_tpu.train.engine import train_acc
from accflow_tpu.train.finetune import fine_tune
from accflow_tpu.utils.config import AttrDict


def train_synthetic_weights(
    tmp: str,
    steps: int,
    qsize: int,
    clips: int,
    ofe: str = "raft",
    seg_len=None,
    reuse: bool = False,
    extra_opt=None,
):
    """Returns (root, ofe_params, acc_params). root is the CVOR dataset
    dir (train split = training data; test split = `clips` held-out
    clips for CVO-protocol EPE)."""
    root = os.path.join(tmp, "cvor")
    num_train = max(4 * clips, 48)
    # reuse only skips synthesis when the data actually exists (an empty
    # pre-created workdir must still synthesize; checkpoints resume
    # independently below).
    if reuse and os.path.exists(os.path.join(root, "train", "meta.json")):
        print(f"[quality] reusing CVOR + checkpoints under {tmp}")
    else:
        print(f"[quality] synthetic CVOR at {root} ({qsize}^2, "
              f"{clips} test clips, seg_len={seg_len})")
        write_synthetic_cvor(root, num_train=num_train, num_test=clips,
                             h=qsize, w=qsize, seg_len=seg_len)

    # Size epochs so the OneCycle schedule spans the steps actually run
    # (stopping mid-warmup would leave the model barely trained). Both
    # engines train on the clean+final CONCAT split, so one epoch is
    # 2*num_train samples (engine.py sample_per_epoch).
    spe = 2 * num_train // 6 + 1  # sample_per_epoch at batch 6 on one chip
    common = dict(
        dataset_root=root, batch_per_gpu=6, image_size=[qsize, qsize],
        lr=2e-4, wdecay=1e-5, epsilon=1e-8, clip=1.0,
        epochs=max(1, round(steps / spe)),
        add_noise=False, log_freq=50, valid_freq=10**9, seed=0,
        log_dir=os.path.join(tmp, "logs"), ckpt_dir=os.path.join(tmp, "ckpt"),
    )
    common.update(extra_opt or {})  # e.g. small=True, acc_hidden=64
    ft_ckpt = os.path.join(tmp, "ckpt_ft")
    ft_resume = "auto" if reuse and os.path.isdir(ft_ckpt) else None
    print(f"[quality] fine-tuning {ofe.upper()} for {steps} steps on "
          "synthetic data" + (" (resume auto)" if ft_resume else ""))
    ft = fine_tune(AttrDict(dict(common, exp_name=f"{ofe.upper()}-synth",
                                 log_dir=os.path.join(tmp, "logs_ft"),
                                 ckpt_dir=ft_ckpt, resume=ft_resume)),
                   max_steps=steps)
    ofe_params = ft.params
    print(f"[quality] training accumulator for {steps} steps")
    ta_resume = "auto" if reuse and os.path.isdir(common["ckpt_dir"]) else None
    ta = train_acc(AttrDict(dict(common, exp_name=f"Acc+{ofe.upper()}-synth",
                                 ofe_params=ofe_params, resume=ta_resume)),
                   max_steps=steps)
    return root, ofe_params, ta.params
