"""High-speed Sintel evaluation dataset (reference data/dataset.py:164-236).

Per sample directory: `2_imgs/` (the original Sintel pair), `43_imgs/`
(high-FPS interpolated frames), one `.flo` GT flow and one occlusion png.
`interv` subsamples the 43-frame sequence (img0, img_interv, ...). Arrays
are returned HWC float32 RGB in [0, 255]; the engines normalize.
"""

from __future__ import annotations

import os
import os.path as osp
from glob import glob
from typing import Dict, List

import numpy as np


def _imread_rgb(path: str) -> np.ndarray:
    import cv2

    return cv2.imread(path)[..., ::-1].astype(np.float32)


class HighSpeedSintel:
    def __init__(
        self, data_dir: str, interv: int = 6, blacklist=(), size=(1024, 436)
    ):
        """size: (W, H) the high-FPS frames are resized to — (1024, 436)
        matches the reference (data/dataset.py:213); tests shrink it."""
        self.data_dir = data_dir
        self.interv = interv
        self.size = tuple(size)
        self.samples: List[str] = [
            osp.join(data_dir, x)
            for x in sorted(os.listdir(data_dir))
            if x not in blacklist
        ]

    def __len__(self) -> int:
        return len(self.samples)

    def get(self, index: int) -> Dict:
        import cv2

        from accflow_tpu.utils.frame_io import read_flow

        root = self.samples[index]
        ori = sorted(glob(osp.join(root, "2_imgs", "*.png"))) + sorted(
            glob(osp.join(root, "2_imgs", "*.jpg"))
        )
        hs = sorted(glob(osp.join(root, "43_imgs", "*.png"))) + sorted(
            glob(osp.join(root, "43_imgs", "*.jpg"))
        )
        gt_flow = read_flow(glob(osp.join(root, "*.flo"))[0])
        occ = cv2.imread(glob(osp.join(root, "*.png"))[0])[..., 0:1]

        imgs_hs = [
            cv2.resize(_imread_rgb(hs[i]), self.size)
            for i in range(0, len(hs), self.interv)
        ]
        return {
            "gt_flow": gt_flow.astype(np.float32),
            "occ_mask": occ.astype(np.float32) / 255.0,
            "sintel_imgs": [_imread_rgb(ori[0]), _imread_rgb(ori[1])],
            "hs_sintel_imgs": imgs_hs,
        }


def fetch_sintel_dataset(
    data_root: str, interv: int = 6, blacklist=(), size=(1024, 436)
):
    return HighSpeedSintel(data_root, interv, blacklist, size)
