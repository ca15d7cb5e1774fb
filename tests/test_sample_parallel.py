"""Data-parallel sampling (parallel/context.py sample_parallel): the
per-pixel samplers batch-shard their canvases/caches over the mesh and —
because partitionable threefry makes the categorical draws
sharding-invariant — must emit BITWISE-identical codes to the unsharded
samplers."""

import jax
import jax.numpy as jnp
import numpy as np

from movae_tpu.models.pixelcnn import (
    PixelCNN,
    PixelSNAIL,
    sample_fast,
    sample_fast_snail,
    sample_wavefront,
)
from movae_tpu.parallel.context import sample_parallel
from movae_tpu.parallel.mesh import make_mesh


def _init(prior, h=4, w=4):
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((2, h, w), jnp.int32)
    return prior.init({"params": rng, "dropout": rng}, z,
                      train=False)["params"]


def test_sample_parallel_pixelcnn_bitwise():
    prior = PixelCNN(num_embeddings=16, embedding_dim=4, hidden_channels=8,
                     num_layers=2)
    params = _init(prior)
    rng = jax.random.PRNGKey(7)
    base = np.asarray(sample_fast(prior, params, rng, 8, 4, 4))
    with sample_parallel(make_mesh()):
        sharded = sample_fast(prior, params, rng, 8, 4, 4)
    assert "data" in str(sharded.sharding.spec)
    np.testing.assert_array_equal(base, np.asarray(sharded))


def test_sample_parallel_wavefront_bitwise():
    prior = PixelCNN(num_embeddings=16, embedding_dim=4, hidden_channels=8,
                     num_layers=2)
    params = _init(prior, 6, 6)
    rng = jax.random.PRNGKey(8)
    base = np.asarray(sample_wavefront(prior, params, rng, 8, 6, 6))
    with sample_parallel(make_mesh()):
        sharded = np.asarray(sample_wavefront(prior, params, rng, 8, 6, 6))
    np.testing.assert_array_equal(base, sharded)


def test_sample_parallel_snail_bitwise():
    prior = PixelSNAIL(num_embeddings=16, embedding_dim=4,
                       hidden_channels=8, num_blocks=1,
                       num_res_blocks_per_layer=1, num_heads=2, dropout=0.0)
    params = _init(prior)
    rng = jax.random.PRNGKey(9)
    # f32 cache for bitwise equality (same choice the fast==naive test
    # makes); bf16 caches are also sharding-invariant but compared looser
    base = np.asarray(sample_fast_snail(prior, params, rng, 8, 4, 4,
                                        cache_dtype=jnp.float32))
    with sample_parallel(make_mesh()):
        sharded = np.asarray(sample_fast_snail(prior, params, rng, 8, 4, 4,
                                               cache_dtype=jnp.float32))
    np.testing.assert_array_equal(base, sharded)


def test_sample_parallel_noop_on_ragged_batch():
    """batch 5 doesn't divide the 8-way mesh: the constraint must no-op,
    not crash (tail chunks of generate_samples)."""
    prior = PixelCNN(num_embeddings=16, embedding_dim=4, hidden_channels=8,
                     num_layers=2)
    params = _init(prior)
    rng = jax.random.PRNGKey(10)
    base = np.asarray(sample_fast(prior, params, rng, 5, 4, 4))
    with sample_parallel(make_mesh()):
        sharded = np.asarray(sample_fast(prior, params, rng, 5, 4, 4))
    np.testing.assert_array_equal(base, sharded)
