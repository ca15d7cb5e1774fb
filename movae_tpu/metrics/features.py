"""Feature-space generative metrics: FID / KID / Inception Score.

Mirrors the reference pipeline (/root/reference/utils/metrics.py:513-914):
denormalize -> bicubic resize shorter-side 299 -> center crop -> ImageNet
normalize -> InceptionV3 pool-2048 features -> Gaussian Fréchet distance
(scipy sqrtm on host, with the same eps fallback and imaginary-part guard),
unbiased polynomial-kernel MMD^2 for KID (50 subsets x 50 samples, degree 3,
gamma=1/dim), and the 10-split Inception Score. Feature extraction is jitted
and batched on the accelerator.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import linalg

from movae_tpu.metrics.inception import InceptionV3, load_params
from movae_tpu.ops.resize import resize_bicubic, resize_bilinear

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def inception_preprocess(batch: jax.Array,
                         method: str = "bicubic") -> jax.Array:
    """[-1,1] -> [0,1] denorm, resize shorter side to 299 (antialias),
    center-crop 299, ImageNet-normalize (metrics.py:542-553). NHWC.

    Matches ``torchvision.transforms.functional.resize(t, 299, <method>,
    antialias=True)`` exactly: shorter-side target with the longer side
    TRUNCATED (``int(299 * long / short)``), no-op when the shorter side
    is already 299, and torch's antialiased kernels (see
    movae_tpu/ops/resize.py — ``jax.image.resize`` uses a different cubic
    kernel and would silently skew FID).

    ``method``: the reference uses BICUBIC for the FID/KID feature passes
    (metrics.py:549-553, 636-640) but torchvision's DEFAULT — BILINEAR —
    for the Inception-Score logits pass (``TF.resize(batch, 299,
    antialias=True)`` with no interpolation argument, metrics.py:873-875);
    both are mirrored bug-for-bug."""
    x = batch.astype(jnp.float32) * 0.5 + 0.5
    x = jnp.clip(x, 0.0, 1.0)
    b, h, w, c = x.shape
    if min(h, w) != 299:
        if h <= w:
            nh, nw = 299, int(299 * w / h)
        else:
            nw, nh = 299, int(299 * h / w)
        resize = resize_bilinear if method == "bilinear" else resize_bicubic
        x = resize(x, nh, nw, antialias=True)
    else:
        nh, nw = h, w
    # TF.center_crop offset: int(round((size - crop)/2)) — banker's round
    top, left = int(round((nh - 299) / 2.0)), int(round((nw - 299) / 2.0))
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, 299, 299, c))
    return (x - _IMAGENET_MEAN) / _IMAGENET_STD


class InceptionTower:
    """Cached jitted feature/logit extractor."""

    _instance = None

    def __init__(self, weights_path: Optional[str] = None):
        self.model = InceptionV3()
        self.variables = load_params(weights_path)

        @jax.jit
        def run(batch):
            feats, logits = self.model.apply(self.variables,
                                             inception_preprocess(batch))
            return feats, logits

        # separate pass for the IS logits: the reference's IS preprocessing
        # resizes BILINEAR (torchvision default, metrics.py:873-875) where
        # the FID path is BICUBIC — two distinct compiled programs
        @jax.jit
        def run_bilinear(batch):
            feats, logits = self.model.apply(
                self.variables, inception_preprocess(batch,
                                                     method="bilinear"))
            return feats, logits

        self._run = run
        self._run_bilinear = run_bilinear

    @classmethod
    def get(cls) -> "InceptionTower":
        if cls._instance is None:
            cls._instance = InceptionTower()
        return cls._instance

    def extract(self, images: np.ndarray, batch_size: int = 128,
                want_logits: bool = False, method: str = "bicubic"):
        """images: (N,H,W,C) float, EXPECTED in [-1,1]: preprocessing
        unconditionally denormalizes with x*0.5+0.5 exactly like the
        reference (metrics.py:542), so [0,1] inputs (non-normalized BCE
        runs) get compressed to [0.5,1] — a deliberate bug-for-bug parity
        choice; the VGG/LPIPS tower auto-ranges instead (vgg.py).
        ``method="bilinear"`` selects the IS-path preprocessing (see
        inception_preprocess)."""
        n = len(images)
        if n == 0:
            return (np.array([]), np.array([])) if want_logits else np.array([])
        # data-parallel tower: shard each (padded, static-shape) batch over
        # the LOCAL devices — no cross-process collectives, so this is safe
        # whether or not the caller gates metrics to process 0
        sharding = None
        local = jax.local_devices()
        if len(local) > 1 and batch_size % len(local) == 0:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            sharding = NamedSharding(
                Mesh(np.asarray(local), ("data",)), PartitionSpec("data"))
        feats, logits = [], []
        for i in range(0, n, batch_size):
            chunk = np.asarray(images[i:i + batch_size])
            valid = len(chunk)
            if valid < batch_size:
                # pad the ragged final batch to the static shape — avoids a
                # second XLA compilation for the remainder
                pad = np.repeat(chunk[-1:], batch_size - valid, axis=0)
                chunk = np.concatenate([chunk, pad])
            run = (self._run_bilinear if method == "bilinear"
                   else self._run)
            f, lg = run(jnp.asarray(chunk) if sharding is None
                        else jax.device_put(chunk, sharding))
            feats.append(np.asarray(f)[:valid])
            if want_logits:
                logits.append(np.asarray(lg)[:valid])
        feats = np.concatenate(feats)
        if want_logits:
            return feats, np.concatenate(logits)
        return feats


def extract_inception_features(images, batch_size: int = 128) -> np.ndarray:
    """Shared features for FID/KID (metrics.py:618-653)."""
    return InceptionTower.get().extract(images, batch_size)


def fid_from_features(real_features: np.ndarray, fake_features: np.ndarray,
                      eps: float = 1e-6) -> float:
    """Fréchet distance between feature Gaussians (metrics.py:656-679)."""
    if len(real_features) == 0 or len(fake_features) == 0:
        return float("nan")
    mu1 = real_features.mean(axis=0)
    mu2 = fake_features.mean(axis=0)
    sigma1 = np.cov(real_features, rowvar=False)
    sigma2 = np.cov(fake_features, rowvar=False)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)
    diff = mu1 - mu2
    ssdiff = diff.dot(diff)
    # scipy >= 1.16 deprecates disp=; inaccuracy surfaces as a warning +
    # non-finite entries, which the eps-offset retry below already handles
    # (metrics.py:594-600), so keep the old disp=False silence
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            print("Warning: FID imaginary component too large, returning nan.")
            return float("nan")
        covmean = covmean.real
    return float(ssdiff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(covmean))


def kid_from_features(real_features: np.ndarray, fake_features: np.ndarray,
                      subset_size: int = 50, n_subsets: int = 50,
                      degree: int = 3, gamma: Optional[float] = None,
                      seed: Optional[int] = None) -> float:
    """Unbiased poly-kernel MMD^2 (metrics.py:682-709)."""
    if len(real_features) == 0 or len(fake_features) == 0:
        return float("nan")
    n_real, dim = real_features.shape
    n_fake = fake_features.shape[0]
    gamma = gamma if gamma is not None else 1.0 / dim
    subset_size = min(subset_size, n_real, n_fake)
    if subset_size < 2:
        return float("nan")

    def k(x, y):
        return (gamma * (x @ y.T) + 1.0) ** degree

    rng = np.random.default_rng(seed)
    vals = []
    for _ in range(n_subsets):
        r = real_features[rng.choice(n_real, subset_size, replace=False)]
        f = fake_features[rng.choice(n_fake, subset_size, replace=False)]
        krr, kff, krf = k(r, r), k(f, f), k(r, f)
        np.fill_diagonal(krr, 0)
        np.fill_diagonal(kff, 0)
        n = subset_size
        mmd2 = (krr.sum() / (n * (n - 1)) + kff.sum() / (n * (n - 1))
                - 2.0 * krf.mean())
        vals.append(max(0.0, mmd2))
    return float(np.mean(vals))


def calculate_fid(real_images, fake_images, batch_size: int = 128,
                  eps: float = 1e-6) -> float:
    """End-to-end FID (metrics.py:513-615)."""
    rf = extract_inception_features(real_images, batch_size)
    ff = extract_inception_features(fake_images, batch_size)
    return fid_from_features(rf, ff, eps)


def calculate_kid(real_images, fake_images, batch_size: int = 128,
                  **kw) -> float:
    rf = extract_inception_features(real_images, batch_size)
    ff = extract_inception_features(fake_images, batch_size)
    return kid_from_features(rf, ff, **kw)


def inception_score_from_probs(probs: np.ndarray, splits: int = 10):
    """IS = exp(mean_splits KL(p(y|x) || p(y))) over given class
    probabilities (metrics.py:866-906). Returns (mean, std)."""
    n = len(probs)
    scores = []
    for i in range(splits):
        # floor-size splits, tail REMAINDER DROPPED — bug-for-bug with the
        # reference slicing i*(n//splits):(i+1)*(n//splits) (metrics.py:905)
        part = probs[i * (n // splits): (i + 1) * (n // splits)]
        if len(part) == 0:
            continue
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-16) - np.log(py + 1e-16))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    if not scores:
        return float("nan"), float("nan")
    return float(np.mean(scores)), float(np.std(scores))


def calculate_inception_score(images, batch_size: int = 128,
                              splits: int = 10):
    """IS over images via the Inception logits tower (metrics.py:835-914).
    Returns (mean, std)."""
    if len(images) == 0:
        return float("nan"), float("nan")
    # the reference's IS pass resizes BILINEAR (torchvision's default for
    # TF.resize with no interpolation argument, metrics.py:873-875) where
    # its FID passes are explicit BICUBIC — mirrored bug-for-bug
    _, logits = InceptionTower.get().extract(images, batch_size,
                                             want_logits=True,
                                             method="bilinear")
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    return inception_score_from_probs(probs, splits)


def precision_recall_from_features(real_features: np.ndarray,
                                   fake_features: np.ndarray,
                                   k: int = 3, nearest_only: bool = True):
    """kNN-manifold precision/recall (metrics.py:712-736, 917-1039 —
    disabled in the reference pipeline, main.py:845-846, but provided).

    ``nearest_only=True`` (default) is the REFERENCE's variant: a sample
    counts as covered only if its single NEAREST manifold point's k-NN
    ball contains it (metrics.py:726-735) — stricter than Kynkäänniemi
    2019's membership test (ANY manifold ball contains it), which remains
    available via ``nearest_only=False``. Cross-framework lockstep of the
    default is pinned by tests/test_kid_pr_lockstep.py."""
    if len(real_features) < k + 1 or len(fake_features) < k + 1:
        return float("nan"), float("nan")

    def kth_nn_radii(x):
        d = np.linalg.norm(x[:, None, :] - x[None, :, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return np.sort(d, axis=1)[:, k - 1]

    def coverage(samples, manifold, radii):
        d = np.linalg.norm(samples[:, None, :] - manifold[None, :, :],
                           axis=-1)
        if nearest_only:
            j = np.argmin(d, axis=1)
            near = d[np.arange(len(samples)), j]
            return float(np.mean(near <= radii[j]))
        return float(np.mean(np.any(d <= radii[None, :], axis=1)))

    r_real = kth_nn_radii(real_features)
    r_fake = kth_nn_radii(fake_features)
    precision = coverage(fake_features, real_features, r_real)
    recall = coverage(real_features, fake_features, r_fake)
    return precision, recall
