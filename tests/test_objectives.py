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


def test_betatc_decomposition_matches_torch_oracle():
    """BetaTCVAE's minibatch-stratified MI/TC/KLD decomposition vs an
    independent torch re-implementation of the reference math
    (betatc_vae.py:262-296), fed the same (z, mu, log_var)."""
    import jax

    from movae_tpu.models import get_network, init_model

    B, D, N = 8, 6, 200
    args = dict(arch="betatc_vae", latent_dim=D, batch_size=B,
                dataset_size=N, anneal_steps=10,
                loss_weights={"reconstruction_loss": 1.0, "mi_loss": 1.0,
                              "tc_loss": 1.0, "kld": 1.0})
    model = get_network(32, 3, args)
    params, bs = init_model(model, jax.random.PRNGKey(0), 32, 3)
    x = jnp.asarray(RNG.uniform(-1, 1, (B, 32, 32, 3)).astype(np.float32))
    (loss_vec, loss_dict, outputs) = model.apply(
        {"params": params, "batch_stats": bs}, x, train=False,
        method="forward_with_losses",
        rngs={"sample": jax.random.PRNGKey(1),
              "dropout": jax.random.PRNGKey(2)})

    z = torch.tensor(np.asarray(outputs["z"], np.float64))
    mu = torch.tensor(np.asarray(outputs["mu"], np.float64))
    lv = torch.tensor(np.asarray(outputs["log_var"], np.float64))

    def ldg(x, m, v):
        norm = -0.5 * (np.log(2 * np.pi) + v)
        return norm - 0.5 * ((x - m) ** 2 * torch.exp(-v))

    log_q_zx = ldg(z, mu, lv).sum(dim=1)
    log_p_z = ldg(z, torch.zeros_like(z), torch.zeros_like(z)).sum(dim=1)
    mat = ldg(z.view(B, 1, D), mu.view(1, B, D), lv.view(1, B, D))
    strat = (N - B + 1) / (N * (B - 1))
    iw = torch.full((B, B), 1.0 / (B - 1), dtype=torch.float64)
    iw.view(-1)[::B] = 1.0 / N
    iw.view(-1)[1::B] = strat
    iw[B - 2, 0] = strat
    mat = mat + iw.log().view(B, B, 1)
    log_q_z = torch.logsumexp(mat.sum(2), dim=1)
    log_prod_q_z = torch.logsumexp(mat, dim=1).sum(1)

    np.testing.assert_allclose(float(loss_dict["mi_loss"]),
                               float((log_q_zx - log_q_z).mean()), rtol=1e-4)
    np.testing.assert_allclose(float(loss_dict["tc_loss"]),
                               float((log_q_z - log_prod_q_z).mean()),
                               rtol=1e-4, atol=1e-5)
    # eval path: anneal = 1.0. The registry force-injects the kld lambda to
    # batch/dataset_size regardless of loss_weights (reference
    # models/__init__.py:50-55), so the logged kld carries that factor.
    np.testing.assert_allclose(float(loss_dict["kld"]),
                               (B / N) * float((log_prod_q_z
                                                - log_p_z).mean()),
                               rtol=1e-4)


def test_rmsprop_matches_torch_semantics():
    """torch RMSprop updates with g / (sqrt(nu) + eps); optax's default
    puts eps inside the sqrt (up to 1e4x smaller early steps). A few steps
    on a quadratic must track torch.optim.RMSprop closely."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from movae_tpu.train.optim import build_optimizer

    w_t = torch.tensor([1.0, -2.0, 3.0], requires_grad=True)
    opt_t = torch.optim.RMSprop([w_t], lr=1e-2, alpha=0.99, eps=1e-8)
    tx = build_optimizer("rmsprop", lambda i: 1e-2)
    w_j = jnp.asarray([1.0, -2.0, 3.0])
    state = tx.init(w_j)
    for _ in range(5):
        opt_t.zero_grad()
        (w_t ** 2).sum().backward()
        opt_t.step()
        g = 2.0 * w_j
        updates, state = tx.update(g, state, w_j)
        w_j = optax.apply_updates(w_j, updates)
    np.testing.assert_allclose(np.asarray(w_j),
                               w_t.detach().numpy(), rtol=1e-5, atol=1e-6)
