"""Attention-path equivalence: blockwise online-softmax vs dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from movae_tpu.ops.attention import (
    blockwise_causal_attention,
    causal_attention,
    dense_causal_attention,
)


def qkv(b=2, h=2, L=512, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.normal(size=(b, h, L, d)).astype(np.float32))
            for _ in range(3)]


def test_blockwise_matches_dense():
    q, k, v = qkv()
    scale = 1.0 / 4.0
    ref = dense_causal_attention(q, k, v, scale)
    out = blockwise_causal_attention(q, k, v, scale, block_q=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_blockwise_gradients_match_dense():
    q, k, v = qkv(L=256)
    scale = 0.25

    g_ref = jax.grad(lambda q_: dense_causal_attention(
        q_, k, v, scale).sum())(q)
    g_blk = jax.grad(lambda q_: blockwise_causal_attention(
        q_, k, v, scale, block_q=64).sum())(q)
    np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)


def test_causality_first_token_unaffected():
    q, k, v = qkv(L=128)
    out1 = causal_attention(q, k, v, 0.25)
    k2 = k.at[:, :, -1].set(99.0)
    v2 = v.at[:, :, -1].set(99.0)
    out2 = causal_attention(q, k2, v2, 0.25)
    # all positions except the last are unaffected by the last key/value
    np.testing.assert_allclose(np.asarray(out1[:, :, :-1]),
                               np.asarray(out2[:, :, :-1]), atol=1e-5)
    assert not np.allclose(np.asarray(out1[:, :, -1]),
                           np.asarray(out2[:, :, -1]))


def test_dispatch_long_sequence_uses_blockwise():
    q, k, v = qkv(b=1, h=1, L=2048, d=8)
    out = causal_attention(q, k, v, 0.35)
    ref = dense_causal_attention(q, k, v, 0.35)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_causal_attention_long_L_dropout_branch():
    """With dropout>0 and train=True at L>1024, CausalAttention must route
    through the memory-scalable path with dropout applied to the attention
    OUTPUT (attention-weight dropout would materialize the dense L^2 matrix
    the flash kernel exists to avoid)."""
    from movae_tpu.models.pixelcnn import CausalAttention

    attn = CausalAttention(channels=16, num_heads=2, dropout=0.2)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 34, 34, 16)).astype(np.float32))  # L=1156 > 1024
    params = attn.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x, train=True)
    out = attn.apply(params, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # dropout actually fires: some outputs exactly zero w.h.p.
    eval_out = attn.apply(params, x, train=False)
    assert not np.allclose(np.asarray(out), np.asarray(eval_out))


def test_attn_dropout_mode_dispatch(monkeypatch):
    """attn_dropout_mode selects the branch at short L: "output" (default,
    1.73x faster — scripts/prior_attn_ab.py) routes through
    ops.attention.causal_attention with dropout on the output; "weights"
    keeps the reference's dense attention-weight dropout
    (pixelcnn_prior.py:126-127). Eval-mode forwards are identical — the
    mode only changes the train-time regularization."""
    import movae_tpu.ops.attention as attn_ops
    from movae_tpu.models.pixelcnn import CausalAttention

    calls = []
    real = attn_ops.causal_attention

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(attn_ops, "causal_attention", spy)

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 4, 4, 16)).astype(np.float32))  # L=16, well below dense max
    outs = {}
    for mode in ("weights", "output"):
        attn = CausalAttention(channels=16, num_heads=2, dropout=0.2,
                               attn_dropout_mode=mode)
        params = attn.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, train=True)
        before = len(calls)
        attn.apply(params, x, train=True,
                   rngs={"dropout": jax.random.PRNGKey(2)})
        used_flash = len(calls) > before
        assert used_flash == (mode == "output"), mode
        outs[mode] = np.asarray(attn.apply(params, x, train=False))
    np.testing.assert_allclose(outs["weights"], outs["output"], atol=0)
