"""Long-stream drift study (VERDICT r4 item 1): does the streaming
surface's quality hold far past the 7-frame clip horizon it was built
from, on motion that actually changes over time?

The reference recurrence only ever composes 5 steps
(/root/reference/networks/AccFlow_.py:157-175); streaming
(accflow_tpu/streaming.py) runs it unbounded. This measures EPE(i) vs
frame index i on >=32-frame synthetic sequences with piecewise-varying
velocity, oscillating rotation/zoom, and an independently-moving
foreground layer (real occlusion events) — exact unwrapped GT throughout
(data/synthetic.py::make_long_sequence) — for:

  stream6 / stream4   the productized streaming surface (ini_init="ini")
  stream6_carry       re-anchoring policy: long-range query warm-started
                      from the advected ACCUMULATED flow (ini_init="carry")
  cold12              the cold-start clip recurrence run over the whole
                      prefix (fused OFE, all intermediate outputs)
  direct12            two-frame estimation I_i -> I_0 (no accumulation) —
                      the baseline accumulation exists to beat: beyond
                      ~half a wrap period the displacement is not
                      recoverable from one pair at all

Weights: fine-tuned OFE + trained accumulator on synthetic 7-frame clips
with TIME-VARYING motion (seg_len=3), via scripts/_synth_train.py (no
released reference checkpoints exist in this environment).

Env knobs: DRIFT_FRAMES (64), DRIFT_SEQS (4), DRIFT_SIZE (256),
DRIFT_CONFIGS (comma filter), QUALITY_STEPS (300), DRIFT_REUSE=<tmpdir>
(resume training / reuse weights), DRIFT_NPZ=<path> (save per-horizon
curves), BENCH_OFE (raft|gma).

Appends per-horizon rows to BENCH_MATRIX.json.
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FRAMES = int(os.environ.get("DRIFT_FRAMES", "64"))
SEQS = int(os.environ.get("DRIFT_SEQS", "4"))
SIZE = int(os.environ.get("DRIFT_SIZE", "256"))
STEPS = int(os.environ.get("QUALITY_STEPS", "300"))
OFE = os.environ.get("BENCH_OFE", "raft")


def make_sequences():
    """SEQS eval sequences, alternating pure-translation+fg and
    affine(rot/zoom)+fg motion. Returns list of dicts (imgs normalized
    to [-1,1] float32 (F,1,H,W,3), bflows (F-1,H,W,2), vis (F-1,H,W))."""
    from accflow_tpu.data.synthetic import make_long_sequence

    out = []
    for s in range(SEQS):
        rng = np.random.default_rng(1000 + s)
        affine = s % 2 == 1
        seq = make_long_sequence(
            rng, SIZE, SIZE, FRAMES, seg_len=8, max_v=2,
            rot_deg=4.0 if affine else 0.0,
            zoom_amp=0.04 if affine else 0.0,
            fg=True,
        )
        imgs = (2.0 * (seq["imgs"].astype(np.float32) / 255.0) - 1.0)[:, None]
        out.append({"imgs": imgs, "bflows": seq["bflows"], "vis": seq["vis"],
                    "kind": "affine" if affine else "translate"})
    return out


def epe_curves(flows, seq, start):
    """flows: (K,H,W,2) predicted F_{i,0} for i=start..start+K-1.
    Returns dict of np arrays (K,): epe all / vis / occ."""
    gt = seq["bflows"][start - 1 : start - 1 + flows.shape[0]]
    vis = seq["vis"][start - 1 : start - 1 + flows.shape[0]]
    err = np.sqrt(((flows - gt) ** 2).sum(-1))
    occ = ~vis
    return {
        "all": err.mean(axis=(1, 2)),
        "vis": np.array([e[v].mean() if v.any() else np.nan
                         for e, v in zip(err, vis)]),
        "occ": np.array([e[o].mean() if o.any() else np.nan
                         for e, o in zip(err, occ)]),
    }


def run_stream(est_builder, acfg, ofe_params, acc_params, seqs, iters,
               ini_init):
    """Streaming EPE curves, averaged over seqs. Returns (curves, K)."""
    import jax

    from accflow_tpu.streaming import StreamAccumulator

    est = est_builder(iters)
    acc = StreamAccumulator(est, acfg, ofe_params, acc_params,
                            ini_init=ini_init)
    all_curves = []
    for seq in seqs:
        imgs = seq["imgs"]
        outs = [np.asarray(acc.reset(imgs[:3]))[0]]
        for i in range(3, imgs.shape[0]):
            outs.append(np.asarray(acc.push(imgs[i]))[0])
        all_curves.append(epe_curves(np.stack(outs), seq, start=2))
    return _avg(all_curves), 2


def run_cold(est, acfg, ofe_params, acc_params, seqs):
    import jax
    import jax.numpy as jnp

    from accflow_tpu.models.accflow import accflow_forward

    @jax.jit
    def fwd(images):
        return accflow_forward(
            acc_params, est.flow_fn(ofe_params), images, acfg,
            ofe_pairs=est.pairs_fn(ofe_params),
        )

    all_curves = []
    for seq in seqs:
        outs = np.asarray(fwd(jnp.asarray(seq["imgs"])))[:, 0]
        all_curves.append(epe_curves(outs, seq, start=2))
    return _avg(all_curves), 2


def run_direct(est, ofe_params, seqs):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(images):
        i0 = jnp.broadcast_to(images[0], images[1:].shape)
        out = est.forward(ofe_params, images[1:, 0], i0[:, 0],
                          final_only=True)
        return out["flow_up"]

    all_curves = []
    for seq in seqs:
        outs = np.asarray(fwd(jnp.asarray(seq["imgs"])))
        all_curves.append(epe_curves(outs, seq, start=1))
    return _avg(all_curves), 1


def _avg(curves):
    return {k: np.nanmean(np.stack([c[k] for c in curves]), axis=0)
            for k in curves[0]}


def main():
    import jax

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig

    from _matrix import record
    from _synth_train import train_synthetic_weights

    reuse = os.environ.get("DRIFT_REUSE")
    tmp = reuse or tempfile.mkdtemp(prefix="drift_")
    print(f"[drift] workdir {tmp}")
    _, ofe_params, acc_params = train_synthetic_weights(
        tmp, steps=STEPS, qsize=SIZE, clips=2, ofe=OFE, seg_len=3,
        reuse=bool(reuse),
    )

    seqs = make_sequences()
    print(f"[drift] {SEQS} sequences x {FRAMES} frames at {SIZE}^2 "
          f"({sum(s['kind'] == 'affine' for s in seqs)} affine)")

    def est_builder(iters):
        return build_flow_estimator(OFE, compute_dtype="bfloat16",
                                    iters=iters, scan_unroll=4)

    acfg = AccFlowConfig(compute_dtype="bfloat16", warm_start=True)
    acfg_cold = AccFlowConfig(compute_dtype="bfloat16")

    configs = {
        "stream6": lambda: run_stream(est_builder, acfg, ofe_params,
                                      acc_params, seqs, 6, "ini"),
        "stream4": lambda: run_stream(est_builder, acfg, ofe_params,
                                      acc_params, seqs, 4, "ini"),
        "stream6_carry": lambda: run_stream(est_builder, acfg, ofe_params,
                                            acc_params, seqs, 6, "carry"),
        "cold12": lambda: run_cold(est_builder(12), acfg_cold, ofe_params,
                                   acc_params, seqs),
        "direct12": lambda: run_direct(est_builder(12), ofe_params, seqs),
    }
    only = os.environ.get("DRIFT_CONFIGS")
    if only:
        keep = set(only.split(","))
        configs = {k: v for k, v in configs.items() if k in keep}

    results = {}
    for name, fn in configs.items():
        curves, start = fn()
        results[name] = (curves, start)
        print(f"[drift] {name} done", flush=True)

    horizons = [i for i in (2, 4, 8, 12, 16, 24, 32, 48, FRAMES - 1)
                if i < FRAMES]
    print(f"\nEPE-all by horizon i (F_i,0), mean over {SEQS} seqs:")
    print(f"{'config':14s} " + " ".join(f"i={i:<6d}" for i in horizons))
    for name, (curves, start) in results.items():
        vals = []
        for i in horizons:
            j = i - start
            vals.append(f"{curves['all'][j]:8.3f}" if 0 <= j < len(curves["all"])
                        else "       -")
        print(f"{name:14s} " + " ".join(vals), flush=True)
        for i in (8, 32, FRAMES - 1):
            j = i - start
            if 0 <= j < len(curves["all"]):
                record(f"drift_epe_all_i{i}", float(curves["all"][j]), "px",
                       config=name, ofe=OFE, frames=FRAMES, size=SIZE,
                       seqs=SEQS, steps=STEPS)

    npz = os.environ.get("DRIFT_NPZ")
    if npz:
        np.savez(npz, **{f"{n}_{k}": c[k] for n, (c, _) in results.items()
                         for k in c},
                 **{f"{n}_start": s for n, (_, s) in results.items()})
        print(f"[drift] curves saved to {npz}")


if __name__ == "__main__":
    main()
