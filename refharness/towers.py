"""Torch mirrors of the torchvision metric towers (InceptionV3, VGG16).

torchvision is not installed in this environment, so these hand-written
torch modules reproduce the torchvision architectures the reference's
metric stack consumes (/root/reference/utils/metrics.py:206-510):

- ``TInception3`` mirrors ``torchvision.models.inception_v3`` with
  ``transform_input=False`` in eval mode (aux head inert); module names
  match torchvision so state_dict keys are compatible with the repo's
  weight converters (movae_tpu/metrics/inception.py convert_torch_weights).
- ``build_vgg16_features`` mirrors ``torchvision.models.vgg16().features``
  (the full 31-module Sequential; the reference slices ``[:30]`` and hooks
  indices 3/8/15/22 for LPIPS, metrics.py:223-244).

Two consumers:
1. tests/test_metric_tower_oracle.py — proves the flax towers match these
   mirrors numerically (preprocessing + forward + FID/IS/LPIPS formulas).
2. refharness/shims/torchvision/models.py — when
   ``MOVAE_REFHARNESS_TOWER_SEED`` is set, serves seeded-random instances
   so the UNMODIFIED reference metric pipeline can run weight-synced
   against movae_tpu in cross-framework eval lockstep studies.

Weights are always random (``randomize``): no pretrained blob exists here.
Weight-synced comparisons convert the same random state_dict into the flax
towers, so any semantic divergence shows up as a numeric mismatch.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F


class TBasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TInceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


class TInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        return torch.cat([b3, bd, F.max_pool2d(x, 3, stride=2)], 1)


class TInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        return torch.cat([b3, b7, F.max_pool2d(x, 3, stride=2)], 1)


class TInceptionE(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class TInception3(tnn.Module):
    """torchvision inception_v3 eval-mode forward (aux head inert).

    ``forward`` returns LOGITS like torchvision's eval-mode forward — the
    reference InceptionV3ForIS calls ``self.model(x)`` for class predictions
    (metrics.py:455-513), and its FID wrapper replaces ``fc`` with Identity
    and walks the layer attributes manually (metrics.py:430-452), both of
    which this surface supports. ``features_and_logits`` exposes the
    pool-2048 features alongside for the oracle tests.
    """

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280)
        self.Mixed_7c = TInceptionE(2048)
        self.fc = tnn.Linear(2048, 1000)

    def features_and_logits(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        feats = torch.flatten(F.adaptive_avg_pool2d(x, (1, 1)), 1)
        return feats, self.fc(feats)

    def forward(self, x):
        return self.features_and_logits(x)[1]


def build_vgg16_features() -> tnn.Sequential:
    """torchvision vgg16().features: the full 31-module Sequential
    (conv indices 0,2,5,7,10,12,14,17,19,21,24,26,28; state_dict keys
    ``features.N.{weight,bias}`` when wrapped in a module with a
    ``features`` attribute). The reference slices ``[:30]`` (metrics.py:228)
    and hooks 3/8/15/22."""
    layers, cin = [], 3
    for ch in (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"):
        if ch == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(cin, ch, 3, padding=1), tnn.ReLU()]
            cin = ch
    return tnn.Sequential(*layers)


class TVGG16(tnn.Module):
    """torchvision vgg16 surface as consumed by the reference's
    VGGFeatureExtractor (metrics.py:223-228): only ``.features`` is read."""

    def __init__(self):
        super().__init__()
        self.features = build_vgg16_features()


def randomize(model: tnn.Module, seed: int) -> None:
    """Seeded, well-scaled random weights (BN stats randomized too so the
    batch_stats conversion path is actually exercised)."""
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        elif k.endswith(("bn.weight",)):
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        elif k.endswith("conv.weight"):
            fan_in = int(np.prod(v.shape[1:]))
            sd[k] = torch.randn(v.shape, generator=g) / np.sqrt(fan_in)
        else:  # bn.bias, running_mean, fc.*, plain conv bias/weight (VGG)
            if k.endswith("weight") and v.ndim == 4:
                fan_in = int(np.prod(v.shape[1:]))
                sd[k] = torch.randn(v.shape, generator=g) / np.sqrt(fan_in)
            elif k.endswith("weight") and v.ndim == 2:
                sd[k] = torch.randn(v.shape, generator=g) * 0.02
            else:
                sd[k] = torch.randn(v.shape, generator=g) * 0.1
    model.load_state_dict(sd)
    model.eval()


def build_inception_v3(seed: int) -> TInception3:
    m = TInception3()
    randomize(m, seed)
    return m


def build_vgg16(seed: int) -> TVGG16:
    m = TVGG16()
    randomize(m, seed)
    return m
