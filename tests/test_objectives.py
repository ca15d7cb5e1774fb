"""Objective-library golden tests against torch.nn.functional.

The reference's losses are thin wrappers over torch.nn.functional
(/root/reference/utils/objectives.py:84-144); torch (CPU) is available in
this environment, so we check our jnp implementations against the actual
torch ops on random inputs — a cross-framework oracle, not a
self-comparison.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from movae_tpu import objectives as obj  # noqa: E402

RNG = np.random.default_rng(0)
X = RNG.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
Y = RNG.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
P = RNG.uniform(0.001, 0.999, (4, 8, 8, 3)).astype(np.float32)  # probs
T = RNG.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32)  # targets
MU = RNG.normal(0, 1, (4, 16)).astype(np.float32)
LV = RNG.normal(0, 1, (4, 16)).astype(np.float32)

tx, ty = torch.tensor(X), torch.tensor(Y)
tp, tt = torch.tensor(P), torch.tensor(T)


def close(a, b, tol=1e-5):
    np.testing.assert_allclose(float(a), float(b), rtol=tol, atol=tol)


def test_mse_per_pixel_mean_matches_torch():
    close(obj.mse_per_pixel_mean(jnp.asarray(X), jnp.asarray(Y)),
          F.mse_loss(ty, tx, reduction="mean"))


def test_mse_per_image_sum_matches_torch():
    close(obj.mse_per_image_sum(jnp.asarray(X), jnp.asarray(Y)),
          F.mse_loss(ty, tx, reduction="sum") / X.shape[0])


def test_bce_per_pixel_mean_matches_torch():
    close(obj.bce_per_pixel_mean(jnp.asarray(T), jnp.asarray(P)),
          F.binary_cross_entropy(tp, tt, reduction="mean"))


def test_bce_per_image_sum_matches_torch():
    close(obj.bce_per_image_sum(jnp.asarray(T), jnp.asarray(P)),
          F.binary_cross_entropy(tp, tt, reduction="sum") / T.shape[0])


def test_bce_log_clamp_matches_torch_at_saturation():
    """torch clamps log() at -100; saturated probabilities must not produce
    inf/nan and must match."""
    p_sat = np.array([[0.0, 1.0, 1e-20, 1.0 - 1e-9]], np.float32)
    t_sat = np.array([[1.0, 0.0, 1.0, 0.0]], np.float32)
    ours = obj.bce_per_pixel_mean(jnp.asarray(t_sat), jnp.asarray(p_sat))
    theirs = F.binary_cross_entropy(torch.tensor(p_sat),
                                    torch.tensor(t_sat), reduction="mean")
    assert np.isfinite(float(ours))
    close(ours, theirs, tol=1e-4)


def test_bce_with_logits_matches_torch():
    close(obj.bce_with_logits_per_pixel_mean(jnp.asarray(T), jnp.asarray(X)),
          F.binary_cross_entropy_with_logits(tx, tt, reduction="mean"))


def test_l1_matches_torch():
    close(obj.laplacian_per_pixel_mean(jnp.asarray(X), jnp.asarray(Y)),
          F.l1_loss(ty, tx, reduction="mean"))
    close(obj.laplacian_per_image_sum(jnp.asarray(X), jnp.asarray(Y)),
          F.l1_loss(ty, tx, reduction="sum") / X.shape[0])


def test_smooth_l1_matches_torch():
    close(obj.smooth_l1_per_pixel_mean(jnp.asarray(X), jnp.asarray(Y)),
          F.smooth_l1_loss(ty, tx, reduction="mean"))
    # exercise both branches of the Huber transition
    big = Y + 3.0
    close(obj.smooth_l1_per_pixel_mean(jnp.asarray(X), jnp.asarray(big)),
          F.smooth_l1_loss(torch.tensor(big), tx, reduction="mean"))


def test_kl_divergence_closed_form():
    """KL(N(mu, sigma^2) || N(0,1)) against the analytic formula computed in
    float64, and against torch.distributions."""
    ours = float(obj.kl_divergence(jnp.asarray(MU), jnp.asarray(LV)))
    mu64, lv64 = MU.astype(np.float64), LV.astype(np.float64)
    manual = (-0.5 * (1 + lv64 - mu64 ** 2 - np.exp(lv64)).sum(1)).mean()
    np.testing.assert_allclose(ours, manual, rtol=1e-5)
    q = torch.distributions.Normal(torch.tensor(MU),
                                   torch.tensor(np.exp(0.5 * LV)))
    p = torch.distributions.Normal(0.0, 1.0)
    theirs = torch.distributions.kl_divergence(q, p).sum(1).mean()
    np.testing.assert_allclose(ours, float(theirs), rtol=1e-4)


def test_registry_dispatch():
    fn, act = obj.get_recon_obj_and_activation("mse", None)
    assert fn is obj.mse_per_pixel_mean and act == "tanh"
    fn, act = obj.get_recon_obj_and_activation("bce")
    assert fn is obj.bce_per_pixel_mean and act == "sigmoid"
    fn, act = obj.get_recon_obj_and_activation("bce", use_logits=True)
    assert fn is obj.bce_with_logits_per_pixel_mean and act == "none"
    with pytest.raises(ValueError):
        obj.get_recon_obj_and_activation("nope")


# --- Sobel / GG edge losses vs independent torch implementations -----------

def _torch_sobel(x_nhwc):
    """Independent NCHW torch Sobel, mirroring the reference's buffers
    (gg_vae.py:44-54): depthwise 3x3 cross-correlation, padding 1."""
    kx = torch.tensor([[-1., 0., 1.], [-2., 0., 2.], [-1., 0., 1.]])
    ky = torch.tensor([[-1., -2., -1.], [0., 0., 0.], [1., 2., 1.]])
    t = torch.tensor(x_nhwc).permute(0, 3, 1, 2)
    c = t.shape[1]
    gx = F.conv2d(t, kx.expand(c, 1, 3, 3), padding=1, groups=c)
    gy = F.conv2d(t, ky.expand(c, 1, 3, 3), padding=1, groups=c)
    return gx, gy


def test_sobel_gradients_match_torch():
    from movae_tpu.ops import sobel

    x = RNG.uniform(-1, 1, (2, 9, 9, 3)).astype(np.float32)
    jgx, jgy = sobel.sobel_gradients(jnp.asarray(x))
    tgx, tgy = _torch_sobel(x)
    np.testing.assert_allclose(np.asarray(jgx),
                               tgx.permute(0, 2, 3, 1).numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jgy),
                               tgy.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_edge_weighted_pixel_loss_matches_torch():
    """gradient_guided_loss: input-edge-magnitude-weighted MSE
    (gg_vae.py:125-138), recomputed independently in torch."""
    from movae_tpu.ops import sobel

    x = RNG.uniform(-1, 1, (2, 9, 9, 3)).astype(np.float32)
    r = RNG.uniform(-1, 1, (2, 9, 9, 3)).astype(np.float32)
    ours = float(sobel.edge_weighted_pixel_loss(jnp.asarray(x),
                                                jnp.asarray(r)))
    gx, gy = _torch_sobel(x)
    mag = torch.sqrt(gx ** 2 + gy ** 2 + 1e-8)
    w = mag.max(dim=1).values
    w = w / (w.max() + 1e-8)
    pix = (torch.tensor(r).permute(0, 3, 1, 2)
           - torch.tensor(x).permute(0, 3, 1, 2)) ** 2
    theirs = (w.unsqueeze(1) * pix).mean()
    np.testing.assert_allclose(ours, float(theirs), rtol=1e-5)


def test_edge_matching_magnitude_matches_torch():
    from movae_tpu.ops import sobel

    x = RNG.uniform(-1, 1, (2, 9, 9, 3)).astype(np.float32)
    r = RNG.uniform(-1, 1, (2, 9, 9, 3)).astype(np.float32)
    ours = float(sobel.edge_matching_magnitude(jnp.asarray(x),
                                               jnp.asarray(r)))
    igx, igy = _torch_sobel(x)
    rgx, rgy = _torch_sobel(r)
    gt = torch.sqrt(igx ** 2 + igy ** 2 + 1e-8)
    gp = torch.sqrt(rgx ** 2 + rgy ** 2 + 1e-8)
    theirs = F.smooth_l1_loss(gp, gt)
    np.testing.assert_allclose(ours, float(theirs), rtol=1e-5)


def test_edge_matching_cosine_matches_torch():
    from movae_tpu.ops import sobel

    x = RNG.uniform(-1, 1, (2, 9, 9, 3)).astype(np.float32)
    r = RNG.uniform(-1, 1, (2, 9, 9, 3)).astype(np.float32)
    ours = float(sobel.edge_matching_cosine(jnp.asarray(x), jnp.asarray(r)))
    igx, igy = _torch_sobel(x)
    rgx, rgy = _torch_sobel(r)
    gt = torch.stack([igx, igy], dim=-1)
    gp = torch.stack([rgx, rgy], dim=-1)
    cos = F.cosine_similarity(F.normalize(gt, dim=-1),
                              F.normalize(gp, dim=-1), dim=-1)
    theirs = 1.0 - cos.mean()
    np.testing.assert_allclose(ours, float(theirs), rtol=1e-4)
