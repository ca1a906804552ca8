"""Build the committed tiny-weights fixture for the CI long-stream drift
test (tests/test_streaming.py::test_long_stream_drift_bound).

Trains RAFT-small + a hidden-64 accumulator on synthetic 64^2 clips with
time-varying motion (seg_len=3), measures the stream6 EPE(i) curve on the
test's exact 36-frame sequence, and saves the weights as float16 .npz
under tests/fixtures/ (~6 MB) so the CPU test can assert a REAL EPE
drift bound without training or released checkpoints.

    python scripts/make_drift_fixture.py          # on the TPU, ~10 min
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = int(os.environ.get("FIXTURE_STEPS", "400"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def drift_sequence():
    """The exact sequence the CI test replays (seeded): 36 frames, 64^2,
    piecewise translation + foreground occluder, velocities small enough
    that the accumulated displacement stays identifiable at 64^2."""
    from accflow_tpu.data.synthetic import make_long_sequence

    rng = np.random.default_rng(77)
    return make_long_sequence(rng, 64, 64, 36, seg_len=6, max_v=1,
                              fg=True, fg_max_v=2)


def stream_epe_curve(ofe_params, acc_params, seq, iters=6):
    import jax

    from accflow_tpu.models import build_flow_estimator
    from accflow_tpu.models.accflow import AccFlowConfig
    from accflow_tpu.streaming import StreamAccumulator

    est = build_flow_estimator("raft", compute_dtype="float32", small=True,
                               iters=iters)
    acfg = AccFlowConfig(compute_dtype="float32", warm_start=True, hidden=64)
    acc = StreamAccumulator(est, acfg, ofe_params, acc_params)
    imgs = (2.0 * (seq["imgs"].astype(np.float32) / 255.0) - 1.0)[:, None]
    outs = [np.asarray(acc.reset(imgs[:3]))[0]]
    for i in range(3, imgs.shape[0]):
        outs.append(np.asarray(acc.push(imgs[i]))[0])
    outs = np.stack(outs)  # F_{i,0}, i=2..35
    gt = seq["bflows"][1 : 1 + outs.shape[0]]
    return np.sqrt(((outs - gt) ** 2).sum(-1)).mean(axis=(1, 2))


def main():
    import jax

    from _synth_train import train_synthetic_weights
    from accflow_tpu.convert.store import save_params

    reuse = os.environ.get("FIXTURE_REUSE")
    tmp = reuse or tempfile.mkdtemp(prefix="drift_fixture_")
    print(f"[fixture] workdir {tmp}")
    _, ofe_params, acc_params = train_synthetic_weights(
        tmp, steps=STEPS, qsize=64, clips=2, ofe="raft", seg_len=3,
        reuse=bool(reuse),
        extra_opt={"small": True, "acc_hidden": 64,
                   "compute_dtype": "float32"},
    )

    curve = stream_epe_curve(ofe_params, acc_params, drift_sequence())
    print("[fixture] stream6 EPE(i), i=2..35:")
    print("  " + " ".join(f"{v:.2f}" for v in curve))
    print(f"[fixture] max {curve.max():.3f}  final {curve[-1]:.3f}")

    os.makedirs(OUT, exist_ok=True)
    f16 = lambda t: jax.tree.map(
        lambda a: np.asarray(a, dtype=np.float16), t)
    save_params(os.path.join(OUT, "drift_small_ofe.npz"), f16(ofe_params))
    save_params(os.path.join(OUT, "drift_small_acc.npz"), f16(acc_params))
    np.save(os.path.join(OUT, "drift_small_epe.npy"),
            curve.astype(np.float32))
    print(f"[fixture] saved under {OUT}")


if __name__ == "__main__":
    main()
