"""Metric suite tests: pixel metrics, HV, FID/KID math on known inputs."""

import jax.numpy as jnp
import numpy as np
import pytest

from movae_tpu.metrics import hv as hv_lib
from movae_tpu.metrics import pixel
from movae_tpu.metrics.features import (
    fid_from_features,
    kid_from_features,
    precision_recall_from_features,
)


def imgs(seed=0, n=4, size=16):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, (n, size, size, 3)).astype(np.float32))


def test_psnr_identical_is_high():
    x = imgs()
    assert float(pixel.psnr(x, x)) > 90.0


def test_psnr_known_value():
    x = imgs()
    y = jnp.clip(x + 0.1, 0, 1)
    mse = float(jnp.mean((x - y) ** 2))
    expected = -10 * np.log10(mse)
    assert abs(float(pixel.psnr(x, y)) - expected) < 0.5


def test_ssim_range_and_identity():
    x = imgs()
    assert float(pixel.ssim(x, x)) == pytest.approx(1.0, abs=1e-4)
    y = imgs(seed=9)
    v = float(pixel.ssim(x, y))
    assert -1.0 <= v < 0.9


def test_ssim_autorange_negative_inputs():
    x = imgs() * 2 - 1  # [-1, 1]
    assert float(pixel.ssim(x, x)) == pytest.approx(1.0, abs=1e-4)


def test_ssnr_identity_clamped():
    x = imgs()
    # perfect reconstruction: noise clamped at 1e-10 -> large positive dB
    assert float(pixel.ssnr(x, x)) > 50.0


def test_fid_identical_features_zero():
    f = np.random.default_rng(0).normal(size=(200, 16)).astype(np.float64)
    assert abs(fid_from_features(f, f.copy())) < 1e-4


def test_fid_shifted_features():
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(500, 8))
    f2 = f1 + 3.0
    fid = fid_from_features(f1, f2)
    assert abs(fid - 8 * 9.0) < 2.0  # ||mu1-mu2||^2 = 8 * 3^2


def test_kid_identical_near_zero():
    f = np.random.default_rng(0).normal(size=(200, 16))
    assert kid_from_features(f, f.copy(), seed=0) < 1e-2


def test_kid_different_positive():
    rng = np.random.default_rng(0)
    f1 = rng.normal(size=(200, 16))
    f2 = rng.normal(size=(200, 16)) + 2.0
    assert kid_from_features(f1, f2, seed=0) > 0.1


def test_precision_recall_identical():
    f = np.random.default_rng(0).normal(size=(50, 4))
    p, r = precision_recall_from_features(f, f.copy())
    assert p == 1.0 and r == 1.0


def test_hv_single_point():
    ind = hv_lib.build_hv_indicator(["a", "b"], None)
    # single point (0.1, 0.1) vs ref (1.1, 1.1) -> 1.0 * 1.0
    assert ind(np.array([[0.1, 0.1]])) == pytest.approx(1.0)
    # dominated region only counts below ref
    assert ind(np.array([[2.0, 0.1]])) == 0.0


def test_hv_multi_point_union():
    ind = hv_lib.HVIndicator(np.array([1.0, 1.0]))
    pts = np.array([[0.5, 0.0], [0.0, 0.5]])
    # union area = 1 - 0.5*0.5 ... compute: total = 0.5*1 + 1*0.5 - 0.5*0.5
    assert ind(pts) == pytest.approx(0.75)


def test_hv_ref_dict_and_list():
    ind = hv_lib.build_hv_indicator(["a", "b"], {"a": 2.0, "b": 2.0})
    assert ind(np.array([[1.0, 1.0]])) == pytest.approx(1.0)
    ind2 = hv_lib.build_hv_indicator(["a", "b"], [2.0, 2.0])
    assert ind2(np.array([[1.0, 1.0]])) == pytest.approx(1.0)


def test_sobel_edge_losses_zero_for_identical():
    from movae_tpu.ops import sobel
    x = imgs()
    assert float(sobel.edge_matching_magnitude(x, x)) < 1e-8
    assert float(sobel.edge_matching_signed_mse(x, x)) < 1e-8
    assert float(sobel.edge_matching_cosine(x, x)) < 1e-5
    assert float(sobel.edge_weighted_pixel_loss(x, x)) < 1e-8


def test_sobel_gradients_detect_edges():
    from movae_tpu.ops import sobel
    x = np.zeros((1, 16, 16, 3), np.float32)
    x[:, :, 8:, :] = 1.0  # vertical edge
    gx, gy = sobel.sobel_gradients(jnp.asarray(x))
    assert float(jnp.abs(gx).max()) > 1.0
    assert float(jnp.abs(gy[:, 2:-2, 2:-2]).max()) < 1e-6


def test_kid_matches_float64_oracle():
    """Unbiased poly-kernel MMD^2 vs a direct float64 re-derivation
    (reference metrics.py:682-709: degree 3, gamma=1/dim, coef 1)."""
    from movae_tpu.metrics.features import kid_from_features

    rng = np.random.default_rng(0)
    n, d = 24, 8
    X = rng.normal(0, 1, (n, d)).astype(np.float32)
    Y = rng.normal(1.0, 1, (n, d)).astype(np.float32)
    got = kid_from_features(X, Y, subset_size=n, n_subsets=1, seed=0)

    x, y = X.astype(np.float64), Y.astype(np.float64)
    g = 1.0 / d
    kxx = (g * x @ x.T + 1.0) ** 3
    kyy = (g * y @ y.T + 1.0) ** 3
    kxy = (g * x @ y.T + 1.0) ** 3
    m = n
    mmd2 = ((kxx.sum() - np.trace(kxx)) / (m * (m - 1))
            + (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
            - 2.0 * kxy.mean())
    # the reference clamps each subset estimate at 0 (metrics.py:708)
    np.testing.assert_allclose(got, max(0.0, mmd2), rtol=1e-4, atol=1e-7)
    assert mmd2 > 0  # ensure this case exercises the unclamped branch


def test_inception_score_matches_float64_oracle():
    """IS = exp(mean_splits KL(p(y|x) || p(y))) on synthetic logits
    (reference metrics.py:835-914, 10 splits)."""
    from movae_tpu.metrics import features as feat_lib

    rng = np.random.default_rng(1)
    n, c = 40, 10
    logits = rng.normal(0, 3, (n, c)).astype(np.float64)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)

    splits = 4
    scores = []
    for part in np.array_split(probs, splits):
        py = part.mean(axis=0, keepdims=True)
        kl = (part * (np.log(part) - np.log(py))).sum(1).mean()
        scores.append(np.exp(kl))
    expected_mean = float(np.mean(scores))

    got_mean, got_std = feat_lib.inception_score_from_probs(
        probs.astype(np.float32), splits=splits)
    np.testing.assert_allclose(got_mean, expected_mean, rtol=1e-4)


def test_ssim_matches_float64_scipy_oracle():
    """11x11 gaussian-window SSIM vs an independent float64 implementation
    using scipy correlate2d (reference formula, metrics.py:14-80)."""
    from scipy.signal import correlate2d

    from movae_tpu.metrics.pixel import ssim

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))

    g = np.exp(-((np.arange(11) - 5) ** 2) / (2 * 1.5 ** 2))
    g = g / g.sum()
    w = np.outer(g, g)

    def blur(x):  # per image/channel, float64, SAME zero padding
        out = np.empty_like(x)
        for n in range(x.shape[0]):
            for c in range(x.shape[-1]):
                out[n, :, :, c] = correlate2d(x[n, :, :, c], w, mode="same")
        return out

    x, y = a.astype(np.float64), b.astype(np.float64)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = blur(x), blur(y)
    s1 = blur(x * x) - mu1 ** 2
    s2 = blur(y * y) - mu2 ** 2
    s12 = blur(x * y) - mu1 * mu2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    np.testing.assert_allclose(got, smap.mean(), rtol=1e-4)


def test_merge_pretrained_strict():
    """Pointing MOVAE_*_WEIGHTS at a wrong/partial npz must raise, not
    silently fall back to random features (which would corrupt FID/IS/LPIPS
    while looking like a successful load)."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest
    from flax import traverse_util

    from movae_tpu.metrics.pretrained import merge_pretrained

    variables = {"params": {"conv": {"kernel": jnp.zeros((3, 3, 1, 4)),
                                     "bias": jnp.zeros((4,))}}}
    flat = {k: np.asarray(v) for k, v in
            traverse_util.flatten_dict(variables, sep="/").items()}

    # complete file merges
    merged = merge_pretrained(variables, dict(flat), "test")
    assert jax.tree_util.tree_structure(merged) == \
        jax.tree_util.tree_structure(variables)

    # missing key -> error
    partial = dict(flat)
    partial.pop("params/conv/bias")
    with _pytest.raises(ValueError, match="missing"):
        merge_pretrained(variables, partial, "test")

    # shape mismatch -> error
    wrong = dict(flat)
    wrong["params/conv/kernel"] = np.zeros((1, 1, 1, 4), np.float32)
    with _pytest.raises(ValueError, match="shape"):
        merge_pretrained(variables, wrong, "test")


def test_batched_pixel_metrics_match_full_set():
    """evaluate_recon_metrics batches PSNR/SSIM in chunks with an
    UNWEIGHTED mean over per-batch values (reference
    _compute_recon_metrics_from_tensors, main.py:335-367); for equal-size
    chunks that equals the single-call value for per-image-mean metrics."""
    import jax.numpy as jnp
    from movae_tpu.metrics import pixel

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    for fn in (pixel.psnr, pixel.ssim):
        full = float(fn(jnp.asarray(a), jnp.asarray(b)))
        vals = [float(fn(jnp.asarray(a[i:i + 4]), jnp.asarray(b[i:i + 4])))
                for i in range(0, 8, 4)]
        assert abs(full - float(np.mean(vals))) < 1e-4, (fn.__name__,)


def test_hv_ref_fallbacks_match_reference():
    """Reference main.py:676-691: <2 objectives -> None; a dict fills
    missing keys with 1.1; a wrong-length list falls back to all-1.1 —
    never silently disabling HV."""
    assert hv_lib.build_hv_indicator(["a"], None) is None
    ind = hv_lib.build_hv_indicator(["a", "b"], {"a": 2.0})
    np.testing.assert_allclose(ind.ref_point, [2.0, 1.1])
    ind2 = hv_lib.build_hv_indicator(["a", "b"], [2.0, 2.0, 2.0])
    np.testing.assert_allclose(ind2.ref_point, [1.1, 1.1])


def test_fid_full_covariance_analytic():
    """Full-covariance Fréchet term cross-checked against an independent
    eigendecomposition: tr((C1 C2)^{1/2}) = tr((C2^{1/2} C1 C2^{1/2})^{1/2})
    — validates the sqrtm/trace plumbing beyond the mean-shift case
    (reference utils/metrics.py:656-679)."""
    rng = np.random.default_rng(3)
    f1 = rng.normal(size=(400, 6)) @ rng.normal(size=(6, 6)) + rng.normal(size=6)
    f2 = rng.normal(size=(400, 6)) @ (0.5 * rng.normal(size=(6, 6))) + 1.0
    mu1, mu2 = f1.mean(0), f2.mean(0)
    C1 = np.cov(f1, rowvar=False)
    C2 = np.cov(f2, rowvar=False)
    w2, V2 = np.linalg.eigh(C2)
    C2h = (V2 * np.sqrt(np.clip(w2, 0, None))) @ V2.T
    wm = np.linalg.eigvalsh(C2h @ C1 @ C2h)
    tr_sqrt = np.sqrt(np.clip(wm, 0, None)).sum()
    expected = ((mu1 - mu2) @ (mu1 - mu2) + np.trace(C1) + np.trace(C2)
                - 2.0 * tr_sqrt)
    got = fid_from_features(f1, f2)
    assert abs(got - expected) < 1e-6, (got, expected)
