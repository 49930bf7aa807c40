"""Torch architectures for the data-prep toolchain (host-side, CPU).

Fresh implementations of the reference's prep networks
(datasets/models.py): a MobileNetV2-encoder U-Net for person segmentation
(models.py:261-355, used by prepare_dataset step 6), a ResNet-encoder
U-Net variant (models.py:57-127, carried for inventory parity, no
pipeline consumer), and a SegNet/VGG16-style Deep-Image-Matting model
(models.py:441-519).  The pretrained weights
(``mobilenetV2_model_checkpoint_metric.pth``, ``BEST_checkpoint.tar``;
make_data_from_GRID.py:505-513) are external assets — ``load_state``
hooks accept them when present.  NOTE: this repo's module/parameter names
differ from the reference's torchvision-based names, so real reference
checkpoints need key remapping; ``_load_torch_state`` fails loudly when
nothing matches instead of silently keeping random init.

These run only in the offline prep pipeline, never on TPU.
"""

from __future__ import annotations

from typing import Optional

import torch
import torch.nn as nn
import torch.nn.functional as F


def _load_torch_state(module: nn.Module, path: str,
                      min_match_frac: float = 0.5):
    """Shared checkpoint loader: unwraps common blob layouts and refuses a
    silent no-op load (strict=False matching ~zero keys)."""
    blob = torch.load(path, map_location="cpu")
    state = blob
    for key in ("state_dict", "model"):
        if isinstance(state, dict) and key in state:
            state = state[key]
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    own = module.state_dict()
    matched = [k for k in state if k in own
               and own[k].shape == state[k].shape]
    if len(matched) < min_match_frac * len(own):
        raise ValueError(
            f"checkpoint {path} matched only {len(matched)}/{len(own)} "
            "parameters — key names likely need remapping")
    module.load_state_dict({k: state[k] for k in matched}, strict=False)
    return len(matched)


class InvertedResidualT(nn.Module):
    def __init__(self, inp, oup, stride, expand):
        super().__init__()
        hidden = inp * expand
        self.use_res = stride == 1 and inp == oup
        layers = []
        if expand != 1:
            layers += [nn.Conv2d(inp, hidden, 1, bias=False),
                       nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True)]
        layers += [nn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden,
                             bias=False),
                   nn.BatchNorm2d(hidden), nn.ReLU6(inplace=True),
                   nn.Conv2d(hidden, oup, 1, bias=False),
                   nn.BatchNorm2d(oup)]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res else self.conv(x)


class MobileNetV2Encoder(nn.Module):
    """Standard MobileNetV2 trunk emitting skip features at 5 scales."""

    CFG = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]

    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, 32, 3, 2, 1, bias=False), nn.BatchNorm2d(32),
            nn.ReLU6(inplace=True))
        blocks = []
        inp = 32
        for t, c, n, s in self.CFG:
            for i in range(n):
                blocks.append(InvertedResidualT(inp, c, s if i == 0 else 1,
                                                t))
                inp = c
        self.blocks = nn.ModuleList(blocks)
        # last block index of each resolution stage:
        # /2 -> 16ch@0, /4 -> 24ch@2, /8 -> 32ch@5, /16 -> 96ch@12
        # (the /32 tail 160ch@15, 320ch@16 is the trunk output)
        self._skip_after = {0, 2, 5, 12}

    def forward(self, x):
        x = self.stem(x)
        skips = []
        for i, b in enumerate(self.blocks):
            x = b(x)
            if i in self._skip_after:
                skips.append(x)
        return x, skips


class UnetMobilenetV2(nn.Module):
    """Person-segmentation U-Net over the MobileNetV2 encoder
    (ref architecture: datasets/models.py:261-355).  Output: 1-ch logit
    map at input resolution."""

    def __init__(self):
        super().__init__()
        self.encoder = MobileNetV2Encoder()
        ups = []
        in_ch = 320
        for c in (96, 32, 24, 16):
            ups.append(nn.Sequential(
                nn.Conv2d(in_ch + c, c, 3, padding=1, bias=False),
                nn.BatchNorm2d(c), nn.ReLU(inplace=True)))
            in_ch = c
        self.ups = nn.ModuleList(ups)
        self.head = nn.Conv2d(16, 1, 1)

    def forward(self, x):
        trunk, skips = self.encoder(x)  # trunk /32; skips /16,/8,/4,/2
        y = trunk
        for up, skip in zip(self.ups, skips[::-1]):
            y = F.interpolate(y, size=skip.shape[-2:], mode="bilinear",
                              align_corners=False)
            y = up(torch.cat([y, skip], dim=1))
        y = F.interpolate(y, size=x.shape[-2:], mode="bilinear",
                          align_corners=False)
        return self.head(y)

    def load_state(self, path: str):
        return _load_torch_state(self, path)


class _BasicBlock(nn.Module):
    def __init__(self, inp, oup, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, oup, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(oup)
        self.conv2 = nn.Conv2d(oup, oup, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(oup)
        self.down = (nn.Sequential(nn.Conv2d(inp, oup, 1, stride,
                                             bias=False),
                                   nn.BatchNorm2d(oup))
                     if stride != 1 or inp != oup else None)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        s = x if self.down is None else self.down(x)
        return F.relu(y + s)


def _res_stage(inp, oup, blocks, stride):
    layers = [_BasicBlock(inp, oup, stride)]
    layers += [_BasicBlock(oup, oup) for _ in range(blocks - 1)]
    return nn.Sequential(*layers)


class UnetResNet(nn.Module):
    """ResNet-34-encoder U-Net segmentation variant
    (ref architecture: datasets/models.py:57-127 — the reference keeps both
    a ResNet- and a MobileNetV2-encoder U-Net; weights are external;
    torchvision is absent from this image so the trunk is built inline)."""

    def __init__(self, depth: int = 34):
        super().__init__()
        if depth not in (18, 34):
            raise ValueError("basic-block trunk supports depth 18 or 34, "
                             f"got {depth}")
        reps = (3, 4, 6, 3) if depth == 34 else (2, 2, 2, 2)
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True))
        self.pool = nn.MaxPool2d(3, 2, 1)
        self.layers = nn.ModuleList([
            _res_stage(64, 64, reps[0], 1),
            _res_stage(64, 128, reps[1], 2),
            _res_stage(128, 256, reps[2], 2),
            _res_stage(256, 512, reps[3], 2)])
        chans = [512, 256, 128, 64, 64]
        ups = []
        in_ch = chans[0]
        for c in chans[1:]:
            ups.append(nn.Sequential(
                nn.Conv2d(in_ch + c, c, 3, padding=1, bias=False),
                nn.BatchNorm2d(c), nn.ReLU(inplace=True)))
            in_ch = c
        self.ups = nn.ModuleList(ups)
        self.head = nn.Conv2d(64, 1, 1)

    def forward(self, x):
        s0 = self.stem(x)                    # /2, 64
        y = self.pool(s0)
        skips = []
        for layer in self.layers:
            y = layer(y)
            skips.append(y)                  # /4 64, /8 128, /16 256, /32 512
        feats = skips[:-1][::-1] + [s0]      # 256,128,64,64
        out = skips[-1]
        for up, skip in zip(self.ups, feats):
            out = F.interpolate(out, size=skip.shape[-2:], mode="bilinear",
                                align_corners=False)
            out = up(torch.cat([out, skip], dim=1))
        out = F.interpolate(out, size=x.shape[-2:], mode="bilinear",
                            align_corners=False)
        return self.head(out)

    def load_state(self, path: str):
        return _load_torch_state(self, path)


class DIMMatting(nn.Module):
    """Deep Image Matting: VGG16-ish encoder over RGB+trimap, mirror
    decoder -> alpha (ref architecture: datasets/models.py:441-519)."""

    def __init__(self):
        super().__init__()

        def block(i, o, n):
            layers = []
            for k in range(n):
                layers += [nn.Conv2d(i if k == 0 else o, o, 3, padding=1),
                           nn.ReLU(inplace=True)]
            return nn.Sequential(*layers)

        self.enc = nn.ModuleList([block(4, 64, 2), block(64, 128, 2),
                                  block(128, 256, 3), block(256, 512, 3),
                                  block(512, 512, 3)])
        self.dec = nn.ModuleList([block(512, 512, 1), block(512, 256, 1),
                                  block(256, 128, 1), block(128, 64, 1),
                                  block(64, 64, 1)])
        self.head = nn.Conv2d(64, 1, 3, padding=1)

    def forward(self, rgb, trimap):
        x = torch.cat([rgb, trimap], dim=1)
        sizes = []
        idxs = []
        for e in self.enc:
            x = e(x)
            sizes.append(x.shape[-2:])
            x, idx = F.max_pool2d(x, 2, return_indices=True,
                                  ceil_mode=True)
            idxs.append(idx)
        for d, size, idx in zip(self.dec, sizes[::-1], idxs[::-1]):
            x = F.max_unpool2d(x, idx, 2, output_size=size)
            x = d(x)
        return torch.sigmoid(self.head(x))

    def load_state(self, path: str):
        return _load_torch_state(self, path)


def predict_mask(model: UnetMobilenetV2, image, size: int = 320):
    """Segmentation inference helper (ref: make_data_from_GRID.py:554-589):
    resize, normalize, sigmoid-threshold back at original size."""
    import numpy as np
    h, w = image.shape[:2]
    x = torch.from_numpy(
        np.ascontiguousarray(image[..., :3])).float().permute(2, 0, 1)
    if x.max() > 1.5:
        x = x / 255.0
    x = F.interpolate(x[None], size=(size, size), mode="bilinear",
                      align_corners=False)
    with torch.no_grad():
        logit = model(x)
    prob = torch.sigmoid(logit)
    prob = F.interpolate(prob, size=(h, w), mode="bilinear",
                         align_corners=False)[0, 0]
    return prob.numpy()
