"""Synthetic CVO-style datasets: a fixture generator for tests/benchmarks
and a stand-in when the real CVO LMDB is unavailable.

Scenes are textured backgrounds translating with constant per-clip
velocity, so ground-truth cross-frame flows are exact (F_{k,0} = -k*v for
backward flows): end-to-end EPE on these clips is meaningful, not noise.
"""

from __future__ import annotations

import numpy as np

from accflow_tpu.data.records import ALL_KEYS, CVORWriter


def _texture(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Smooth random RGB texture with enough structure for matching."""
    base = rng.uniform(0, 255, size=(h // 4 + 2, w // 4 + 2, 3))
    up = np.kron(base, np.ones((4, 4, 1)))[:h, :w]
    noise = rng.uniform(-12, 12, size=(h, w, 3))
    return np.clip(up + noise, 0, 255).astype(np.float32)


def _shift(img: np.ndarray, dy: int, dx: int) -> np.ndarray:
    return np.roll(np.roll(img, dy, axis=0), dx, axis=1)


def make_clip(rng: np.random.Generator, h: int, w: int, frames: int = 7):
    """One clip: frames + exact fflows/bflows/delta flows (HWC, channel-cat)."""
    tex = _texture(rng, h, w)
    vy, vx = int(rng.integers(-3, 4)), int(rng.integers(-3, 4))
    imgs = [
        _shift(tex, vy * t, vx * t).astype(np.uint8) for t in range(frames)
    ]
    # Backward flow F_{k,0}: content at frame k maps back to frame 0.
    def flow(dy, dx):
        f = np.empty((h, w, 2), np.float32)
        f[..., 0] = dx
        f[..., 1] = dy
        return f

    fflows = [flow(vy * k, vx * k) for k in range(2, frames)]       # F0k
    bflows = [flow(-vy * k, -vx * k) for k in range(2, frames)]     # Fk0
    dflows_f = [flow(vy, vx)] * (frames - 1)                        # F_{t,t+1}
    dflows_b = [flow(-vy, -vx)] * (frames - 1)                      # F_{t+1,t}
    return {
        "imgs": np.concatenate(imgs, axis=-1),
        "imgs_blur": np.concatenate(imgs, axis=-1),
        "fflows": np.concatenate(fflows, axis=-1),
        "bflows": np.concatenate(bflows, axis=-1),
        "delta_fflows": np.concatenate(dflows_f, axis=-1),
        "delta_bflows": np.concatenate(dflows_b, axis=-1),
    }


def key_specs(h: int, w: int, frames: int = 7):
    return {
        "imgs": {"shape": (h, w, 3 * frames), "dtype": "uint8"},
        "imgs_blur": {"shape": (h, w, 3 * frames), "dtype": "uint8"},
        "fflows": {"shape": (h, w, 2 * (frames - 2)), "dtype": "uint16"},
        "bflows": {"shape": (h, w, 2 * (frames - 2)), "dtype": "uint16"},
        "delta_fflows": {"shape": (h, w, 2 * (frames - 1)), "dtype": "uint16"},
        "delta_bflows": {"shape": (h, w, 2 * (frames - 1)), "dtype": "uint16"},
    }


def write_synthetic_cvor(
    root: str,
    num_train: int = 4,
    num_test: int = 2,
    h: int = 64,
    w: int = 64,
    frames: int = 7,
    seed: int = 0,
) -> str:
    """Create <root>/{train,test} CVOR datasets. Returns root."""
    import os.path as osp

    rng = np.random.default_rng(seed)
    for sub, n in (("train", num_train), ("test", num_test)):
        with CVORWriter(osp.join(root, sub), key_specs(h, w, frames)) as wr:
            for _ in range(n):
                wr.add(make_clip(rng, h, w, frames))
    return root
