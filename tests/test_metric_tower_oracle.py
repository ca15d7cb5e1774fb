"""Torch-side oracles for the metric towers.

The absolute-FID acceptance criterion hinges on three things being
*numerically* equivalent to the reference pipeline
(/root/reference/utils/metrics.py:513-914), independent of the pretrained
blob (which cannot be staged in this zero-egress environment):

1. the bicubic preprocessing (``TF.resize(299, BICUBIC, antialias=True)``
   + center crop + ImageNet normalize),
2. the InceptionV3 tower forward (torchvision ``inception_v3``,
   ``transform_input=False``),
3. the VGG16/LPIPS tower forward.

torchvision is not installed here, so the oracles are hand-written torch
mirrors of the torchvision architectures (state_dict keys intentionally
identical to torchvision's so the repo's weight converters apply
unchanged). Weights are randomized with a fixed seed, converted through
``convert_torch_weights`` and merged into the flax towers — any semantic
divergence (conv padding, BN eps, pooling count_include_pad, resize
kernel, crop offsets, feature taps) shows up as a numeric mismatch.

With these green, plugging a real converted torchvision checkpoint in via
``MOVAE_INCEPTION_WEIGHTS`` / ``MOVAE_VGG16_WEIGHTS`` yields standard
absolute FID/IS/KID/LPIPS by construction.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F


# The torch mirrors of the torchvision tower architectures live in
# refharness/towers.py (shared with the torchvision shim's weight-synced
# tower mode); this module anchors the flax towers against them.
from refharness.towers import TInception3, TVGG16, randomize as _randomize


def _torch_inception_preprocess(x: "torch.Tensor") -> "torch.Tensor":
    """Reference _inception_preprocess on NCHW in [-1,1]
    (metrics.py:546-553), expressed without torchvision: TF.resize(299,
    BICUBIC, antialias=True) == F.interpolate(..., antialias=True) at the
    shorter-side-truncated size; TF.center_crop offset = int(round(d/2))."""
    x = torch.clamp(x * 0.5 + 0.5, 0.0, 1.0)
    h, w = x.shape[-2:]
    if min(h, w) != 299:
        if h <= w:
            nh, nw = 299, int(299 * w / h)
        else:
            nw, nh = 299, int(299 * h / w)
        x = F.interpolate(x, size=(nh, nw), mode="bicubic", antialias=True)
    else:
        nh, nw = h, w
    top = int(round((nh - 299) / 2.0))
    left = int(round((nw - 299) / 2.0))
    x = x[..., top:top + 299, left:left + 299]
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    return (x - mean) / std


# ---------------------------------------------------------------------------
# resize + preprocess oracles
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,out,aa", [
    ((2, 32, 32, 3), (299, 299), True),    # the FID upscale path
    ((2, 512, 384, 3), (299, 224), True),  # downscale, non-square
    ((1, 64, 48, 2), (48, 96), True),      # mixed up/down
    ((2, 40, 56, 3), (20, 28), False),     # classic kernel, downscale
    ((1, 17, 23, 1), (51, 46), False),     # classic kernel, upscale
])
def test_resize_bicubic_matches_torch(shape, out, aa):
    from movae_tpu.ops.resize import resize_bicubic
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(resize_bicubic(x, out[0], out[1], antialias=aa))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = F.interpolate(t, size=out, mode="bicubic", antialias=aa)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    # atol 1e-4: AA-downscale sums ~2*scale taps/axis, so f32 accumulation
    # order (matmul here vs sequential in ATen) wiggles the last ~2 bits
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("hw", [(32, 32), (32, 48), (600, 400), (299, 320)])
def test_inception_preprocess_matches_torch(hw):
    from movae_tpu.metrics.features import inception_preprocess
    rng = np.random.default_rng(1)
    x = rng.uniform(-1.2, 1.2, (2, hw[0], hw[1], 3)).astype(np.float32)
    got = np.asarray(inception_preprocess(x))
    want = _torch_inception_preprocess(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    assert got.shape == (2, 299, 299, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# full-tower forward + end-to-end FID/IS equivalence
# ---------------------------------------------------------------------------

def test_inception_tower_and_fid_match_torch(tmp_path):
    from movae_tpu.metrics import features as feat_mod
    from movae_tpu.metrics.inception import convert_torch_weights

    tm = TInception3()
    _randomize(tm, 1234)
    npz = str(tmp_path / "inception.npz")
    convert_torch_weights(tm.state_dict(), npz)
    tower = feat_mod.InceptionTower(weights_path=npz)

    rng = np.random.default_rng(2)
    real = rng.uniform(-1, 1, (6, 32, 32, 3)).astype(np.float32)
    fake = np.clip(real + 0.3 * rng.standard_normal(real.shape), -1,
                   1).astype(np.float32)

    jf, jl = tower.extract(real, batch_size=2, want_logits=True)
    with torch.no_grad():
        tf_, tl = tm.features_and_logits(_torch_inception_preprocess(
            torch.from_numpy(np.transpose(real, (0, 3, 1, 2)))))
    tf_, tl = tf_.numpy(), tl.numpy()

    # ~94 stacked f32 convs: allow 1e-3-relative accumulation drift
    scale = np.abs(tf_).max()
    np.testing.assert_allclose(jf, tf_, rtol=5e-3, atol=2e-3 * scale)
    np.testing.assert_allclose(jl, tl, rtol=5e-3,
                               atol=2e-3 * np.abs(tl).max())

    # end-to-end FID: same images through both pipelines, same Fréchet
    # formula; 4 feature dims keep the 6-sample covariances full-rank
    # (stable sqrtm) without weakening the pipeline-equivalence claim
    jff = tower.extract(fake, batch_size=2)
    with torch.no_grad():
        tff, _ = tm.features_and_logits(_torch_inception_preprocess(
            torch.from_numpy(np.transpose(fake, (0, 3, 1, 2)))))
    fid_j = feat_mod.fid_from_features(jf[:, :4], jff[:, :4])
    fid_t = feat_mod.fid_from_features(tf_[:, :4], tff.numpy()[:, :4])
    assert fid_t > 0.0
    assert abs(fid_j - fid_t) / fid_t < 2e-2

    # Inception Score from the logit head
    pj = np.asarray(torch.softmax(torch.from_numpy(jl), dim=-1))
    pt = np.asarray(torch.softmax(torch.from_numpy(tl), dim=-1))
    is_j, _ = feat_mod.inception_score_from_probs(pj, splits=2)
    is_t, _ = feat_mod.inception_score_from_probs(pt, splits=2)
    assert abs(is_j - is_t) / is_t < 1e-2


def test_vgg_lpips_matches_torch(tmp_path):
    from movae_tpu.metrics.vgg import (VGG16Features, convert_torch_weights,
                                       load_params, make_lpips_fn)

    # torchvision vgg16() surface (full features Sequential; conv indices
    # 0,2,5,...; state_dict keys features.N.{weight,bias}) from the shared
    # mirror — the LPIPS taps are at 3/8/15/22 so the conv5 block is inert
    tv = TVGG16()
    _randomize(tv, 77)
    npz = str(tmp_path / "vgg.npz")
    convert_torch_weights(tv.state_dict(), npz)
    variables = load_params(npz)

    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + 0.2 * rng.standard_normal(a.shape), -1,
                1).astype(np.float32)

    # forward-tap equivalence at conv3_3 (the perceptual-loss tap)
    taps = VGG16Features().apply(variables, _vgg_preprocess_np(a))
    with torch.no_grad():
        t = torch.from_numpy(
            np.transpose(_vgg_preprocess_np(a), (0, 3, 1, 2)))
        torch_taps = {}
        for i, m in enumerate(tv.features):
            t = m(t)
            name = {3: "conv1_2", 8: "conv2_2", 15: "conv3_3",
                    22: "conv4_3"}.get(i)
            if name:
                torch_taps[name] = np.transpose(t.numpy(), (0, 2, 3, 1))
    for name, want in torch_taps.items():
        got = np.asarray(taps[name])
        np.testing.assert_allclose(
            got, want, rtol=2e-3, atol=1e-3 * max(np.abs(want).max(), 1e-3),
            err_msg=name)

    # LPIPS end-to-end (reference formula, metrics.py:331-357)
    lpips_j = float(make_lpips_fn(variables)(a, b))
    lpips_t = _torch_lpips(tv.features, a, b)
    assert abs(lpips_j - lpips_t) / lpips_t < 1e-2


def _vgg_preprocess_np(x: np.ndarray) -> np.ndarray:
    """Mirror of vgg.preprocess (auto-range + ImageNet norm) in numpy so
    both frameworks see bit-identical inputs."""
    x = x.astype(np.float32)
    if x.min() < 0:
        x = (x + 1.0) / 2.0
    x = np.clip(x, 0.0, 1.0)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (x - mean) / std


def _torch_lpips(features: tnn.Sequential, a: np.ndarray,
                 b: np.ndarray) -> float:
    """Reference LPIPS semantics (metrics.py:331-357) on the torch mirror:
    unit-normalize channels at each tap, squared diff summed over channels,
    mean over space, mean over layers+batch."""
    taps = {3, 8, 15, 22}
    with torch.no_grad():
        ta = torch.from_numpy(np.transpose(_vgg_preprocess_np(a),
                                           (0, 3, 1, 2)))
        tb = torch.from_numpy(np.transpose(_vgg_preprocess_np(b),
                                           (0, 3, 1, 2)))
        scores = []
        for i, m in enumerate(features):
            ta, tb = m(ta), m(tb)
            if i in taps:
                na = ta / ta.norm(dim=1, keepdim=True).clamp(min=1e-10)
                nb = tb / tb.norm(dim=1, keepdim=True).clamp(min=1e-10)
                d = (na - nb).pow(2).sum(dim=1)
                scores.append(d.mean(dim=(1, 2)))
        return float(torch.stack(scores).mean())


def test_refharness_tf_shim_matches_preprocess_oracle():
    """The refharness torchvision.transforms.functional shim (used when the
    UNMODIFIED reference metric stack runs in eval lockstep studies) must
    reproduce the proven preprocessing: resize(299, BICUBIC, antialias) +
    center_crop(299) + ImageNet normalize == _torch_inception_preprocess
    (itself anchored against the flax pipeline above)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "refharness", "shims", "torchvision",
        "transforms", "functional.py")
    spec = importlib.util.spec_from_file_location("_shim_tf", path)
    TF = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(TF)

    rng = np.random.default_rng(5)
    for hw in ((32, 32), (40, 56), (299, 320)):
        x = torch.from_numpy(rng.uniform(
            -1, 1, (2, 3, hw[0], hw[1])).astype(np.float32))
        x01 = torch.clamp(x * 0.5 + 0.5, 0.0, 1.0)
        got = TF.resize(x01, 299, interpolation=TF.InterpolationMode.BICUBIC,
                        antialias=True)
        got = TF.center_crop(got, [299, 299])
        got = TF.normalize(got, mean=[0.485, 0.456, 0.406],
                           std=[0.229, 0.224, 0.225])
        want = _torch_inception_preprocess(x)
        np.testing.assert_allclose(got.numpy(), want.numpy(), rtol=1e-5,
                                   atol=1e-5)


@pytest.mark.parametrize("shape,out,aa", [
    ((2, 32, 32, 3), (299, 299), True),    # the IS upscale path
    ((2, 512, 384, 3), (299, 224), True),  # downscale, non-square
    ((1, 64, 48, 2), (48, 96), True),      # mixed up/down
    ((2, 40, 56, 3), (20, 28), False),     # classic kernel, downscale
    ((1, 17, 23, 1), (51, 46), False),     # classic kernel, upscale
])
def test_resize_bilinear_matches_torch(shape, out, aa):
    """r5: the reference's Inception-Score pass resizes BILINEAR
    (torchvision's default for TF.resize with no interpolation argument,
    metrics.py:873-875) — both torch bilinear paths are mirrored like the
    bicubic pair above."""
    from movae_tpu.ops.resize import resize_bilinear
    rng = np.random.default_rng(4)
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(resize_bilinear(x, out[0], out[1], antialias=aa))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    want = F.interpolate(t, size=out, mode="bilinear", antialias=aa,
                         align_corners=False)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_is_logits_path_matches_torch(tmp_path):
    """End-to-end IS-path equivalence through the BILINEAR preprocessing:
    reference calculate_inception_score pipeline (denorm -> TF.resize(299,
    antialias=True) [bilinear default] -> center crop -> normalize ->
    inception logits -> softmax -> split-KL, metrics.py:835-914) vs
    calculate_inception_score on the weight-synced flax tower."""
    import os

    from movae_tpu.metrics import features as feat_mod
    from movae_tpu.metrics.inception import convert_torch_weights

    tm = TInception3()
    _randomize(tm, 555)
    npz = str(tmp_path / "inception_is.npz")
    convert_torch_weights(tm.state_dict(), npz)

    rng = np.random.default_rng(6)
    imgs = rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)

    # torch side: the reference's IS preprocessing, bilinear default
    x = torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2)))
    x = torch.clamp(x * 0.5 + 0.5, 0, 1)
    x = F.interpolate(x, size=(299, 299), mode="bilinear", antialias=True)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        tl = tm((x - mean) / std)
    pt = np.asarray(torch.softmax(tl, dim=-1))
    is_t, _ = feat_mod.inception_score_from_probs(pt, splits=2)

    # flax side: the production IS surface on the synced tower
    tower = feat_mod.InceptionTower(weights_path=npz)
    old = feat_mod.InceptionTower._instance
    feat_mod.InceptionTower._instance = tower
    try:
        is_j, _ = feat_mod.calculate_inception_score(imgs, batch_size=4,
                                                     splits=2)
    finally:
        feat_mod.InceptionTower._instance = old

    assert abs(is_j - is_t) / is_t < 1e-2, (is_j, is_t)
