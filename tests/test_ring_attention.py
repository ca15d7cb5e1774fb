"""Ring (sequence-parallel) attention vs the dense oracle.

Runs on the 8-virtual-CPU-device mesh (conftest). Covers: forward equality,
the L % S padding path, gradients through the ring (scan + ppermute
transpose), composition with a data-parallel batch axis, the
context-parallel dispatch in ops.attention.causal_attention, and a full
PixelSNAIL loss under the installed context.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _qkv(key, b, h, L, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (b, h, L, d), dtype),
            jax.random.normal(kk, (b, h, L, d), dtype),
            jax.random.normal(kv, (b, h, L, d), dtype))


def _mesh(num_seq, num_data=1):
    from movae_tpu.parallel.mesh import make_mesh
    devs = jax.devices()[: num_data * num_seq]
    return make_mesh(num_data=num_data, num_model=1, num_seq=num_seq,
                     devices=devs)


@pytest.mark.parametrize("zigzag", [True, False])
@pytest.mark.parametrize("L,S", [(64, 4), (60, 8), (16, 2)])
def test_ring_matches_dense_forward(L, S, zigzag):
    from movae_tpu.ops.attention import dense_causal_attention
    from movae_tpu.ops.ring_attention import ring_causal_attention

    q, k, v = _qkv(jax.random.PRNGKey(0), 2, 2, L, 16)
    sm = 0.25
    mesh = _mesh(S)
    ring = jax.jit(lambda a, b_, c: ring_causal_attention(
        a, b_, c, sm, mesh, batch_axis=None, zigzag=zigzag))(q, k, v)
    dense = dense_causal_attention(q, k, v, sm)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("zigzag", [True, False])
def test_ring_matches_dense_grads(zigzag):
    from movae_tpu.ops.attention import dense_causal_attention
    from movae_tpu.ops.ring_attention import ring_causal_attention

    q, k, v = _qkv(jax.random.PRNGKey(1), 1, 2, 32, 8)
    sm = 1.0 / np.sqrt(8.0)
    mesh = _mesh(4)
    w = jax.random.normal(jax.random.PRNGKey(2), q.shape)

    def loss_ring(q, k, v):
        return jnp.sum(w * ring_causal_attention(q, k, v, sm, mesh,
                                                 batch_axis=None,
                                                 zigzag=zigzag))

    def loss_dense(q, k, v):
        return jnp.sum(w * dense_causal_attention(q, k, v, sm))

    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


def test_ring_composes_with_data_parallel_batch():
    from movae_tpu.ops.attention import dense_causal_attention
    from movae_tpu.ops.ring_attention import ring_causal_attention

    q, k, v = _qkv(jax.random.PRNGKey(3), 4, 2, 24, 8)
    sm = 0.3
    mesh = _mesh(num_seq=4, num_data=2)
    ring = jax.jit(lambda a, b_, c: ring_causal_attention(
        a, b_, c, sm, mesh, batch_axis="data"))(q, k, v)
    dense = dense_causal_attention(q, k, v, sm)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_causal_attention_dispatches_ring_under_context():
    from movae_tpu.ops.attention import causal_attention, \
        dense_causal_attention
    from movae_tpu.parallel.context import context_parallel, \
        get_context_parallel

    q, k, v = _qkv(jax.random.PRNGKey(4), 2, 2, 40, 8)
    sm = 0.5
    mesh = _mesh(4)
    assert get_context_parallel() is None
    with context_parallel(mesh, batch_axis=None):
        assert get_context_parallel().size == 4
        out = jax.jit(lambda a, b_, c: causal_attention(a, b_, c, sm))(
            q, k, v)
    assert get_context_parallel() is None
    dense = dense_causal_attention(q, k, v, sm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_pixelsnail_loss_invariant_under_context_parallel():
    """Full PixelSNAIL loss_function (train=True, dropout=0) is numerically
    identical with and without the ring-attention context installed."""
    from movae_tpu.models.pixelcnn import PixelSNAIL
    from movae_tpu.parallel.context import context_parallel

    prior = PixelSNAIL(num_embeddings=16, embedding_dim=8,
                       hidden_channels=16, num_blocks=2,
                       num_res_blocks_per_layer=1, num_heads=2, dropout=0.0)
    rng = jax.random.PRNGKey(5)
    z = jax.random.randint(rng, (2, 6, 6), 0, 16)
    params = prior.init({"params": rng, "dropout": rng}, z,
                        train=False)["params"]

    def loss(p, z):
        return prior.apply({"params": p}, z, train=True,
                           method="loss_function",
                           rngs={"dropout": rng})["total_loss"]

    base = jax.jit(loss)(params, z)
    mesh = _mesh(num_seq=4, num_data=2)
    with context_parallel(mesh):  # batch_axis='data': L=36 pads to 40
        cp = jax.jit(loss)(params, z)
    np.testing.assert_allclose(float(cp), float(base), rtol=1e-5, atol=1e-6)


def test_prior_loss_and_grads_invariant_with_seq_sharded_trunk():
    """With the code grid's row count divisible by the seq axis, the conv
    trunk is row-sharded (seq_shard_spatial) and the ring gets pre-sharded
    q/k/v; loss AND grads must match the unsharded trace (conv halo
    exchange + ring backward are exact). Grid 8x8, seq=4 -> 2 rows/device
    with a 7x7 masked conv_in (multi-hop halos)."""
    from movae_tpu.models.pixelcnn import PixelSNAIL
    from movae_tpu.parallel.context import context_parallel

    prior = PixelSNAIL(num_embeddings=16, embedding_dim=8,
                       hidden_channels=16, num_blocks=1,
                       num_res_blocks_per_layer=1, num_heads=2, dropout=0.0)
    rng = jax.random.PRNGKey(7)
    z = jax.random.randint(rng, (2, 8, 8), 0, 16)
    params = prior.init({"params": rng, "dropout": rng}, z,
                        train=False)["params"]

    def loss(p, z):
        return prior.apply({"params": p}, z, train=True,
                           method="loss_function",
                           rngs={"dropout": rng})["total_loss"]

    base, gbase = jax.jit(jax.value_and_grad(loss))(params, z)
    mesh = _mesh(num_seq=4, num_data=2)
    with context_parallel(mesh):
        cp, gcp = jax.jit(jax.value_and_grad(loss))(params, z)
    np.testing.assert_allclose(float(cp), float(base), rtol=1e-5, atol=1e-6)
    flat_b = jax.tree_util.tree_leaves(gbase)
    flat_c = jax.tree_util.tree_leaves(gcp)
    for a, b in zip(flat_c, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6)


def test_pixelcnn_conv_prior_invariant_under_context_parallel():
    """The conv-only PixelCNN prior also row-shards its trunk under the
    context (no attention involved)."""
    from movae_tpu.models.pixelcnn import PixelCNN
    from movae_tpu.parallel.context import context_parallel

    prior = PixelCNN(num_embeddings=16, embedding_dim=8,
                     hidden_channels=12, num_layers=2)
    rng = jax.random.PRNGKey(8)
    z = jax.random.randint(rng, (2, 8, 8), 0, 16)
    params = prior.init({"params": rng, "dropout": rng}, z,
                        train=False)["params"]

    def loss(p, z):
        return prior.apply({"params": p}, z, train=True,
                           method="loss_function",
                           rngs={"dropout": rng})["total_loss"]

    base = jax.jit(loss)(params, z)
    mesh = _mesh(num_seq=4, num_data=2)
    with context_parallel(mesh):
        cp = jax.jit(loss)(params, z)
    np.testing.assert_allclose(float(cp), float(base), rtol=1e-5, atol=1e-6)


def test_hierarchical_prior_invariant_under_context_parallel():
    """HierarchicalPixelSNAIL (attention top + conditioned conv bottom):
    both levels route through the ring/constraint machinery under the
    context; loss must match the unsharded trace. Top 4x4 (L=16, pads to
    the 8-stripe zigzag), bottom 8x8 (rows divisible -> sharded trunk)."""
    from movae_tpu.models.pixelcnn import HierarchicalPixelSNAIL
    from movae_tpu.parallel.context import context_parallel

    prior = HierarchicalPixelSNAIL(num_embeddings=16, embedding_dim=8,
                                   hidden_channels=16, num_blocks_top=1,
                                   num_res_blocks_per_layer=1, num_heads=2,
                                   num_layers_bottom=2, dropout=0.0)
    rng = jax.random.PRNGKey(9)
    zt = jax.random.randint(rng, (2, 4, 4), 0, 16)
    zb = jax.random.randint(jax.random.PRNGKey(10), (2, 8, 8), 0, 16)
    params = prior.init({"params": rng, "dropout": rng}, zt, zb,
                        train=False)["params"]

    def loss(p, zt, zb):
        return prior.apply({"params": p}, zt, zb, train=True,
                           method="loss_function",
                           rngs={"dropout": rng})["total_loss"]

    base = jax.jit(loss)(params, zt, zb)
    mesh = _mesh(num_seq=4, num_data=2)
    with context_parallel(mesh):
        cp = jax.jit(loss)(params, zt, zb)
    np.testing.assert_allclose(float(cp), float(base), rtol=1e-5, atol=1e-6)


def test_ring_bf16_matches_f32_dense():
    """bf16 inputs: the ring accumulates in f32 (like the flash path), so
    its outputs should track the f32 dense oracle within bf16 rounding."""
    from movae_tpu.ops.attention import dense_causal_attention
    from movae_tpu.ops.ring_attention import ring_causal_attention

    qf, kf, vf = _qkv(jax.random.PRNGKey(12), 2, 2, 32, 8)
    q, k, v = (x.astype(jnp.bfloat16) for x in (qf, kf, vf))
    sm = 1.0 / np.sqrt(8.0)
    mesh = _mesh(4)
    ring = jax.jit(lambda a, b_, c: ring_causal_attention(
        a, b_, c, sm, mesh, batch_axis=None))(q, k, v)
    assert ring.dtype == jnp.bfloat16
    dense = dense_causal_attention(qf, kf, vf, sm)
    np.testing.assert_allclose(np.asarray(ring, np.float32),
                               np.asarray(dense), rtol=0.05, atol=0.05)


def test_make_mesh_seq_axis_validation():
    from movae_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_seq=2)
    assert mesh.shape["seq"] == 2
    assert mesh.shape["data"] == jax.device_count() // 2
    with pytest.raises(ValueError):
        make_mesh(num_model=3, num_seq=3)  # 9 does not divide 8
