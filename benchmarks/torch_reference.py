"""Torch reference-structure baseline for bench.py.

The reference repo publishes no benchmark numbers (BASELINE.md), so the
baseline is *measured*: a torch model with the reference generator
architecture (SameBlock/DownBlocks -> dense motion -> grid_sample warp ->
bottleneck -> UpBlocks, ref:modules/generator.py + ref:modules/dense_motion.py)
driven frame-at-a-time exactly like ref:demo.py:212-281, on the host CPU
(torch-cpu is what this image provides; the recorded unit says so).
"""
from __future__ import annotations

import time

import numpy as np


def build_torch_generator():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class Down(nn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.conv = nn.Conv2d(i, o, 3, padding=1)
            self.norm = nn.BatchNorm2d(o)

        def forward(self, x):
            return F.avg_pool2d(F.relu(self.norm(self.conv(x))), 2)

    class Up(nn.Module):
        def __init__(self, i, o):
            super().__init__()
            self.conv = nn.Conv2d(i, o, 3, padding=1)
            self.norm = nn.BatchNorm2d(o)

        def forward(self, x):
            return F.relu(self.norm(self.conv(
                F.interpolate(x, scale_factor=2))))

    class Res(nn.Module):
        def __init__(self, f):
            super().__init__()
            self.c1 = nn.Conv2d(f, f, 3, padding=1)
            self.c2 = nn.Conv2d(f, f, 3, padding=1)
            self.n1 = nn.BatchNorm2d(f)
            self.n2 = nn.BatchNorm2d(f)

        def forward(self, x):
            h = self.c1(F.relu(self.n1(x)))
            return x + self.c2(F.relu(self.n2(h)))

    class Hourglass(nn.Module):
        def __init__(self, be, in_f, blocks, max_f):
            super().__init__()
            downs, ch = [], in_f
            chans = [min(max_f, be * 2 ** (i + 1)) for i in range(blocks)]
            for c in chans:
                downs.append(Down(ch, c))
                ch = c
            self.downs = nn.ModuleList(downs)
            ups = []
            for i in range(blocks - 1, -1, -1):
                in_filters = (1 if i == blocks - 1 else 2) * min(max_f, be * 2 ** (i + 1))
                ups.append(Up(in_filters, min(max_f, be * 2 ** i)))
            self.ups = nn.ModuleList(ups)

        def forward(self, x):
            skips = [x]
            for d in self.downs:
                skips.append(d(skips[-1]))
            out = skips.pop()
            import torch as _t
            for u in self.ups:
                out = u(out)
                out = _t.cat([out, skips.pop()], dim=1)
            return out

    class RefGenerator(nn.Module):
        """Reference-shaped generator incl. dense motion, full size."""

        def __init__(self):
            super().__init__()
            self.first = nn.Sequential(nn.Conv2d(3, 64, 7, padding=3),
                                       nn.BatchNorm2d(64), nn.ReLU())
            self.down1 = Down(64, 128)
            self.down2 = Down(128, 256)
            self.hourglass = Hourglass(64, 44, 5, 1024)
            self.mask = nn.Conv2d(64 + 44, 11, 7, padding=3)
            self.occl = nn.Conv2d(64 + 44, 1, 7, padding=3)
            self.bottleneck = nn.Sequential(*[Res(256) for _ in range(6)])
            self.up1 = Up(256, 128)
            self.up2 = Up(128, 64)
            self.final = nn.Conv2d(64, 3, 7, padding=3)

        def forward(self, src, kp_d, kp_s):
            import torch
            import torch.nn.functional as F
            B = src.shape[0]
            feat = self.down2(self.down1(self.first(src)))
            small = F.interpolate(src, scale_factor=0.25)
            # 11 warped copies + heatmaps -> hourglass -> mask
            grid = torch.stack(torch.meshgrid(
                torch.linspace(-1, 1, 64), torch.linspace(-1, 1, 64),
                indexing="xy"), -1)[None]
            motions = grid[:, None] - kp_d[:, :, None, None] + kp_s[:, :, None, None]
            motions = torch.cat([grid[:, None].repeat(B, 1, 1, 1, 1), motions], 1)
            rep = small[:, None].repeat(1, 11, 1, 1, 1).view(B * 11, 3, 64, 64)
            warped = F.grid_sample(rep, motions.view(B * 11, 64, 64, 2))
            heat = torch.randn(B, 11, 1, 64, 64, device=src.device)
            hg_in = torch.cat([heat, warped.view(B, 11, 3, 64, 64)], 2)
            pred = self.hourglass(hg_in.view(B, 44, 64, 64))
            mask = torch.softmax(self.mask(pred), dim=1)
            deformation = (motions.permute(0, 1, 4, 2, 3).view(B, 11, 2, 64, 64)
                           * mask[:, :, None]).sum(1).permute(0, 2, 3, 1)
            occ = torch.sigmoid(self.occl(pred))
            out = F.grid_sample(feat, deformation) * occ
            out = self.bottleneck(out)
            out = self.up2(self.up1(out))
            return torch.sigmoid(self.final(out))

    return RefGenerator()


def measure_reference_fps(n_frames: int = 8) -> float:
    """Frame-at-a-time generator forward (the reference inference structure,
    ref:demo.py:212-281) on torch-cpu; returns frames/sec."""
    import torch
    model = build_torch_generator().eval()
    src = torch.rand(1, 3, 256, 256)
    kp_d = torch.rand(1, 10, 2) * 0.5
    kp_s = torch.rand(1, 10, 2) * 0.5
    with torch.no_grad():
        model(src, kp_d, kp_s)  # warm-up
        t0 = time.time()
        for _ in range(n_frames):
            model(src, kp_d, kp_s)
        dt = time.time() - t0
    return n_frames / dt
