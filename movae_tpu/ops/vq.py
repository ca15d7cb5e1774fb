"""Fused vector-quantization op (nearest-codebook lookup).

TPU-native implementation of the reference VectorQuantizer hot path
(/root/reference/models/vq_vae.py:27-64): L2 distance matrix + argmin +
codebook gather, plus the commitment/embedding losses and straight-through
estimator assembled around it.

Two backends:
  * **Pallas kernel** (TPU): tiles the flattened latents over the grid with
    the codebook resident in VMEM; computes the distance tile via one MXU
    matmul, takes the row-argmin, and emits the quantized rows with a second
    (one-hot) MXU matmul — the (N, K) distance matrix never touches HBM.
    The custom VJP scatters the quantized-row cotangent back to the codebook
    with the same one-hot matmul, tiled and accumulated in VMEM.
  * **XLA fallback** (CPU / interpret): the same math in jnp; XLA fuses it
    well enough for small problems and it is the reference for tests.

The op is differentiable exactly like the reference semantics:
``q = codebook[argmin dist]`` passes gradients to the codebook (gather →
scatter-add) and none to the latents; callers build the straight-through
estimator ``z + sg(q - z)`` and the two MSE losses on top.
"""

from __future__ import annotations

import functools
from typing import Tuple

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


def _pallas_enabled() -> bool:
    """Pallas VQ is opt-in (MOVAE_VQ_PALLAS=1) until validated on the target
    TPU generation; the XLA path is the default and is already matmul-bound."""
    import os
    return os.environ.get("MOVAE_VQ_PALLAS") == "1" and _on_tpu() \
        and pltpu is not None


# ---------------------------------------------------------------------------
# XLA reference implementation
# ---------------------------------------------------------------------------

def _lookup_xla(z_flat: Array, codebook: Array) -> Tuple[Array, Array]:
    zf = z_flat.astype(jnp.float32)
    cb = codebook.astype(jnp.float32)
    d = (jnp.sum(zf * zf, axis=1, keepdims=True)
         + jnp.sum(cb * cb, axis=1)[None, :]
         - 2.0 * zf @ cb.T)
    inds = jnp.argmin(d, axis=1).astype(jnp.int32)
    q = jnp.take(codebook, inds, axis=0)
    return q, inds


# ---------------------------------------------------------------------------
# Pallas forward/backward kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(z_ref, cb_ref, cbsq_ref, q_ref, inds_ref):
    z = z_ref[:].astype(jnp.float32)          # (Tn, D)
    cb = cb_ref[:].astype(jnp.float32)        # (K, D)
    k = cb.shape[0]
    # distances via one MXU matmul; ||z||^2 is constant per row -> skip it.
    # ||e||^2 is precomputed host-side as a (1, K) row (cbsq) — in-kernel
    # lane reduction + broadcast tripped Mosaic's scoped-vmem accounting.
    dots = jnp.dot(z, cb.T, preferred_element_type=jnp.float32)   # (Tn, K)
    dist = cbsq_ref[:] - 2.0 * dots
    # argmin via min+first-match (argmin/one_hot lowered poorly in Mosaic)
    dmin = jnp.min(dist, axis=1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    inds = jnp.min(jnp.where(dist <= dmin, iota, jnp.int32(k)), axis=1)
    one_hot = (iota == inds[:, None]).astype(jnp.float32)
    q_ref[:] = jnp.dot(one_hot, cb, preferred_element_type=jnp.float32)
    inds_ref[:] = inds[:, None]


def _bwd_kernel(inds_ref, dq_ref, dcb_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dcb_ref[:] = jnp.zeros_like(dcb_ref)

    inds = inds_ref[:][:, 0]                                     # (Tn,)
    k = dcb_ref.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (inds.shape[0], k), 1)
    one_hot = (iota == inds[:, None]).astype(jnp.float32)
    dq = dq_ref[:].astype(jnp.float32)                           # (Tn, D)
    dcb_ref[:] += jnp.dot(one_hot.T, dq, preferred_element_type=jnp.float32)


def _lookup_pallas_fwd(z_flat: Array, codebook: Array) -> Tuple[Array, Array]:
    n, d = z_flat.shape
    k = codebook.shape[0]
    tile = 256
    n_pad = _round_up(max(n, tile), tile)
    z_p = jnp.pad(z_flat, ((0, n_pad - n), (0, 0)))
    cb32 = codebook.astype(jnp.float32)
    cb_sq = jnp.sum(cb32 * cb32, axis=1)[None, :]  # (1, K)
    grid = (n_pad // tile,)
    q, inds2d = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
    )(z_p, cb32, cb_sq)
    return q[:n].astype(codebook.dtype), inds2d[:n, 0]


def _lookup_pallas_bwd(k: int, d: int, inds: Array, dq: Array) -> Array:
    n = inds.shape[0]
    tile = 256
    n_pad = _round_up(max(n, tile), tile)
    # pad with index k (one_hot of an out-of-range index is all-zero)
    inds_p = jnp.pad(inds[:, None], ((0, n_pad - n), (0, 0)),
                     constant_values=k)
    dq_p = jnp.pad(dq, ((0, n_pad - n), (0, 0)))
    grid = (n_pad // tile,)
    dcb = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, d), jnp.float32),
    )(inds_p, dq_p)
    return dcb


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _lookup_tpu(z_flat: Array, codebook: Array) -> Tuple[Array, Array]:
    return _lookup_pallas_fwd(z_flat, codebook)


def _lookup_tpu_fwd(z_flat, codebook):
    q, inds = _lookup_pallas_fwd(z_flat, codebook)
    # residuals must be JAX arrays; the codebook carries K/D/dtype for bwd
    return (q, inds), (inds, codebook)


def _lookup_tpu_bwd(res, cts):
    inds, codebook = res
    dq, _ = cts  # no cotangent for integer indices
    k, d = codebook.shape
    dcb = _lookup_pallas_bwd(k, d, inds, dq.astype(jnp.float32))
    dz = jnp.zeros((inds.shape[0], d), dq.dtype)
    return dz, dcb.astype(codebook.dtype)


_lookup_tpu.defvjp(_lookup_tpu_fwd, _lookup_tpu_bwd)


def vq_lookup(z_flat: Array, codebook: Array,
              use_pallas: bool = None) -> Tuple[Array, Array]:
    """Nearest-codebook lookup: returns (quantized rows, indices).

    Differentiable w.r.t. the codebook (gather semantics); zero gradient to
    ``z_flat`` (matching ``codebook[argmin]`` in the reference).
    """
    if use_pallas is None:
        use_pallas = _pallas_enabled()
    if use_pallas:
        return _lookup_tpu(z_flat, codebook)
    return _lookup_xla(z_flat, codebook)


def vector_quantize(z: Array, codebook: Array, use_pallas: bool = None):
    """Full VQ layer forward (vq_vae.py:27-64) on NHWC latents.

    Returns a dict:
      ``quantized``    straight-through quantized latents (B,H,W,D)
      ``commitment``   mse(sg(q), z)
      ``embedding``    mse(q, sg(z))
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
