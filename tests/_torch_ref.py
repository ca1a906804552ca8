"""Shared setup for tests importing the PyTorch reference from
/root/reference: sys.path insertion + a naive-but-exact CPU stand-in for
torchvision.ops.DeformConv2d (the CUDA op the reference AccFlow_ imports;
torchvision is not installed here). Import this module BEFORE importing
anything from `networks.*`."""

import os
import sys
import types

import torch

REF = "/root/reference"

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

if "torchvision" not in sys.modules:
    class _DeformConv2d(torch.nn.Module):
        """torchvision's documented modulated-deform-conv semantics."""

        def __init__(self, cin, cout, k, stride, pad):
            super().__init__()
            assert k == 3 and stride == 1 and pad == 1
            self.weight = torch.nn.Parameter(torch.randn(cout, cin, 3, 3) * 0.05)
            self.bias = torch.nn.Parameter(torch.zeros(cout))

        def forward(self, x, offset, mask):
            n, cin, h, w = x.shape
            cols = []
            ys = torch.arange(h, dtype=torch.float32).view(1, h, 1)
            xs = torch.arange(w, dtype=torch.float32).view(1, 1, w)
            for k in range(9):
                ky, kx = k // 3, k % 3
                py = ys + (ky - 1) + offset[:, 2 * k]
                px = xs + (kx - 1) + offset[:, 2 * k + 1]
                gx = 2 * px / max(w - 1, 1) - 1
                gy = 2 * py / max(h - 1, 1) - 1
                grid = torch.stack([gx, gy], dim=-1)
                samp = torch.nn.functional.grid_sample(
                    x, grid, align_corners=True, padding_mode="zeros"
                )
                cols.append(samp * mask[:, k : k + 1])
            col = torch.cat(cols, dim=1)  # (N, 9*cin, H, W), tap-major
            wmat = self.weight.permute(2, 3, 1, 0).reshape(9 * cin, -1)
            out = torch.einsum("nchw,co->nohw", col, wmat)
            return out + self.bias.view(1, -1, 1, 1)

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.DeformConv2d = _DeformConv2d
    tv.ops = tv_ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv_ops
