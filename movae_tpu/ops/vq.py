"""Fused vector-quantization op (nearest-codebook lookup).

TPU-native implementation of the reference VectorQuantizer hot path
(/root/reference/models/vq_vae.py:27-64): L2 distance matrix + argmin +
codebook gather, plus the commitment/embedding losses and straight-through
estimator assembled around it.

Two backends:
  * **Pallas kernel** (TPU): tiles the flattened latents over the grid with
    the codebook resident in VMEM; computes the distance tile with one MXU
    matmul and reduces it to the per-row argmin **inside VMEM**, emitting
    only the (N,) index vector — the (N, K) distance matrix never touches
    HBM (the HBM-bandwidth win; SURVEY.md §2.6 #1). The quantized rows are
    then an exact XLA gather ``codebook[inds]`` via ``gather_rows``.
  * **XLA fallback** (default): the same math in jnp; on TPU the distance
    matmul uses the same default MXU precision, so backends agree.

Differentiability matches the reference semantics: ``q = codebook[argmin]``
passes gradients to the codebook and none to the latents; callers build the
straight-through estimator ``z + sg(q - z)`` and the two MSE losses on top.
The codebook cotangent is mathematically a scatter-add of the output
cotangent rows, but XLA:TPU serializes scatters, so ``gather_rows`` defines
a custom VJP computing the identical sum as a one-hot MXU matmul
(``one_hot(inds)^T @ g``); ``used_codes_mask`` likewise replaces the usage
scatter with a compare-any reduction (tests/test_scatter_free.py pins both
to the naive forms and asserts the train-step HLO is scatter-free).

Backend choice (measured on v5e, full VQ-VAE train step at bs 256): the XLA
path is equal-or-faster (69.6k vs 64.7k img/s) because XLA fuses the
distance/argmin with the surrounding STE/MSE math and the VQ op is a small
fraction of an MXU-bound step — so **XLA is the default and only production
path**. The Pallas kernel is kept as a validated reference implementation
(exact index-match tested vs XLA in tests/test_vq.py) reachable only via an
explicit ``use_pallas=True``; there is no env-var switch.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on some hosts
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Nearest-code index computation
# ---------------------------------------------------------------------------

def _nearest_inds_xla(z_flat: Array, codebook: Array) -> Array:
    zf = z_flat.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    d = (jnp.sum(zf * zf, axis=1, keepdims=True)
         + jnp.sum(cb * cb, axis=1)[None, :]
         - 2.0 * zf @ cb.T)
    return jnp.argmin(d, axis=1).astype(jnp.int32)


def _inds_kernel(z_ref, cb_ref, cbsq_ref, inds_ref):
    z = z_ref[:].astype(jnp.float32)          # (Tn, D)
    cb = cb_ref[:].astype(jnp.float32)        # (K, D)
    k = cb.shape[0]
    # distances up to the per-row constant ||z||^2 (irrelevant to argmin);
    # ||e||^2 is precomputed host-side — an in-kernel lane reduction +
    # broadcast tripped Mosaic's scoped-vmem accounting.
    dots = jnp.dot(z, cb.T, preferred_element_type=jnp.float32)   # (Tn, K)
    dist = cbsq_ref[:] - 2.0 * dots
    # argmin as min + first-match (plain argmin lowers poorly in Mosaic)
    dmin = jnp.min(dist, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    inds = jnp.min(jnp.where(dist <= dmin, iota, jnp.int32(k)), axis=1)
    inds_ref[:] = inds[:, None]


def _nearest_inds_pallas(z_flat: Array, codebook: Array) -> Array:
    n, d = z_flat.shape
    k = codebook.shape[0]
    tile = 256
    n_pad = _round_up(max(n, tile), tile)
    z_p = jnp.pad(z_flat.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    cb32 = codebook.astype(jnp.float32)
    cb_sq = jnp.sum(cb32 * cb32, axis=1)[None, :]  # (1, K)
    inds2d = pl.pallas_call(
        _inds_kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
    )(z_p, cb32, cb_sq)
    return inds2d[:n, 0]


def nearest_code_indices(z_flat: Array, codebook: Array,
                         use_pallas: Optional[bool] = None) -> Array:
    """(N, D) latents + (K, D) codebook -> (N,) int32 nearest-code indices.
    Non-differentiable (indices)."""
    z_flat = jax.lax.stop_gradient(z_flat)
    codebook = jax.lax.stop_gradient(codebook)
    if use_pallas and _on_tpu() and pltpu is not None:
        return _nearest_inds_pallas(z_flat, codebook)
    return _nearest_inds_xla(z_flat, codebook)


@jax.custom_vjp
def _gather_rows(codebook: Array, inds: Array) -> Array:
    return jnp.take(codebook, inds, axis=0)


def _gather_rows_fwd(codebook, inds):
    return jnp.take(codebook, inds, axis=0), (inds, codebook.shape[0])


def _gather_rows_bwd(res, g):
    # The codebook cotangent of a row gather is mathematically a
    # scatter-add of ``g`` into the selected rows — but XLA:TPU serializes
    # scatters (no vector scatter unit), which makes the default
    # ``jnp.take`` VJP the slowest op in the VQ train step. Express the
    # same sum as ``one_hot(inds)^T @ g``: one (K, N) x (N, D) MXU matmul
    # with f32 accumulation — identical math, different (deterministic)
    # summation order.
    inds, k = res
    one_hot = jax.nn.one_hot(inds, k, dtype=g.dtype)
    grad_cb = jax.lax.dot_general(
        one_hot, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(g.dtype)
    return grad_cb, None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)

# public alias: models embed discrete codes through the same matmul-VJP
# gather (flax nn.Embed's take-based VJP is a scatter-add — serialized on
# TPU — and the code-embedding gradient is the prior step's only scatter)
gather_rows = _gather_rows


def vq_lookup(z_flat: Array, codebook: Array,
              use_pallas: Optional[bool] = None) -> Tuple[Array, Array]:
    """Nearest-codebook lookup: returns (quantized rows, indices).

    Differentiable w.r.t. the codebook (gather semantics; the VJP is the
    scatter-add sum expressed as a one-hot matmul — see ``_gather_rows``);
    zero gradient to ``z_flat`` (matching ``codebook[argmin]`` in the
    reference, vq_vae.py:39-48).
    """
    inds = nearest_code_indices(z_flat, codebook, use_pallas)
    q = _gather_rows(codebook, inds)
    return q, inds


def used_codes_mask(inds: Array, num_embeddings: int) -> Array:
    """(…,) int32 indices -> (K,) bool mask of codes that appear.

    The natural ``zeros(K).at[inds].set(True)`` lowers to an XLA scatter,
    which TPUs execute serially per update (B*H*W updates per step);
    the broadcast compare-any form is one vectorized (N, K) pass."""
    inds = inds.reshape(-1)
    k_iota = jnp.arange(num_embeddings, dtype=inds.dtype)
    return jnp.any(inds[:, None] == k_iota[None, :], axis=0)


def vector_quantize(z: Array, codebook: Array,
                    use_pallas: Optional[bool] = None):
    """Full VQ layer forward (vq_vae.py:27-64) on NHWC latents.

    Returns a dict:
      ``quantized``    straight-through quantized latents (B,H,W,D)
      ``commitment``   mse(sg(q), z)     (vq_vae.py:51)
      ``embedding``    mse(q, sg(z))     (vq_vae.py:52)
      ``encoding_inds``(B*H*W,) flat indices for usage stats / prior training
    """
    b, h, w, d = z.shape
    z32 = z.astype(jnp.float32)
    q_rows, inds = vq_lookup(z32.reshape(-1, d), codebook, use_pallas)
    q = q_rows.astype(jnp.float32).reshape(b, h, w, d)
    commitment = jnp.mean(jnp.square(jax.lax.stop_gradient(q) - z32))
    embedding = jnp.mean(jnp.square(q - jax.lax.stop_gradient(z32)))
    quantized = z32 + jax.lax.stop_gradient(q - z32)
    return {
        "quantized": quantized,
        "commitment": commitment,
        "embedding": embedding,
        "encoding_inds": inds,
    }


def ema_codebook_update(codebook: Array, cluster_size: Array, ema_embed: Array,
                        z_flat: Array, inds: Array, decay: float = 0.99,
                        eps: float = 1e-5):
    """Optional EMA codebook update (van den Oord 2017, appendix) — not used
    by the reference (loss-based codebook, vq_vae.py:51-52) but provided as
    the BASELINE.json north-star mentions it. Returns updated
    (codebook, cluster_size, ema_embed)."""
    k, d = codebook.shape
    one_hot = jax.nn.one_hot(inds, k, dtype=jnp.float32)
    counts = one_hot.sum(axis=0)
    embed_sums = one_hot.T @ z_flat.astype(jnp.float32)
    cluster_size = cluster_size * decay + (1 - decay) * counts
    ema_embed = ema_embed * decay + (1 - decay) * embed_sums
    n = cluster_size.sum()
    stable = (cluster_size + eps) / (n + k * eps) * n
    new_codebook = ema_embed / stable[:, None]
    return new_codebook.astype(codebook.dtype), cluster_size, ema_embed
