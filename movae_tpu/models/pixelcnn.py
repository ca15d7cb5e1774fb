"""PixelCNN / PixelSNAIL priors over discrete VQ codes.

TPU-native rebuild of the reference priors
(/root/reference/models/pixelcnn_prior.py): masked A/B convolutions, gated
residual blocks, causal self-attention (PixelSNAIL), and the hierarchical
two-level P(z_top) * P(z_bottom | z_top) factorization for VQ-VAE2.

Performance redesign (the reference's slowest path, SURVEY.md §2.6 #4):
the reference samples by running the FULL network once per pixel in a Python
loop (pixelcnn_prior.py:338-348) — O(HW * full-forward). Here sampling is a
single compiled ``lax.fori_loop`` with **incremental activation caches**:
each masked conv keeps a padded cache of its input plane and computes only
the current pixel's dot product (one small MXU matmul per layer per pixel),
and PixelSNAIL attention keeps a KV cache. Asymptotically O(HW * k^2 * C^2)
instead of O((HW)^2 * k^2 * C^2) — the px/s headline lever.

Codes are (B, H, W) int32; logits are NHWC (B, H, W, K).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from movae_tpu.objectives import integer_cross_entropy

Array = jax.Array

# Longest raster sequence for which attention uses the dense L x L matrix
# (and with it the reference's attention-WEIGHT dropout semantics,
# pixelcnn_prior.py:126-127); beyond it the flash/blockwise path applies
# dropout to the attention OUTPUT instead. Shared with warn_long_seq_dropout.
DENSE_ATTENTION_MAX_L = 1024

# The PixelSNAIL incremental sampler splits its raster loop into this many
# segments, each compiled with a static KV-prefix length covering only the
# pixels it contains — mean KV-cache read traffic (the sampler's bottleneck)
# drops to ~(1 + 1/n)/2 of the full-L reads at the cost of n compiled loop
# bodies. Measured on v5e (bs 256, 16x16, 8 blocks, interleaved medians):
# bf16 S=1/4/8/16 -> 392k/475k/534k/546k px/s; int8 S=4/8/16 ->
# 617k/697k/710k px/s. 8 is the knee (S=16 buys <2% for 2x the compiles).
SNAIL_KV_SEGMENTS = 8

# CLI spelling -> KV-cache dtype (--kv_cache_dtype). int8 is the measured
# production default; f32 is the bitwise naive-equality configuration.
KV_CACHE_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                   "int8": jnp.int8}


class GatherEmbed(nn.Module):
    """Drop-in ``nn.Embed``: same param tree (one ``embedding`` table, same
    default init), but the lookup goes through ``ops.vq.gather_rows`` whose
    VJP is a one-hot matmul — ``nn.Embed``'s take-based VJP is a
    scatter-add, which XLA:TPU executes serially per update and which is
    the prior train step's only scatter (B*H*W updates into (K, D))."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, inputs: Array) -> Array:
        from movae_tpu.ops.vq import gather_rows

        table = self.param("embedding", nn.linear.default_embed_init,
                           (self.num_embeddings, self.features))
        out = gather_rows(table, inputs.reshape(-1))
        return out.reshape(inputs.shape + (self.features,))


def make_conv_mask(kh: int, kw: int, cin: int, cout: int,
                   mask_type: str) -> np.ndarray:
    """Raster-order causal mask for an HWIO conv kernel
    (pixelcnn_prior.py:40-50)."""
    mask = np.zeros((kh, kw, cin, cout), np.float32)
    mask[: kh // 2, :, :, :] = 1.0
    mask[kh // 2, : kw // 2, :, :] = 1.0
    if mask_type == "B":
        mask[kh // 2, kw // 2, :, :] = 1.0
    return mask


class MaskedConv(nn.Module):
    """Masked conv: the kernel is multiplied by the causal mask at apply time
    (pure; the torch reference mutates weight.data in forward,
    pixelcnn_prior.py:52-54)."""

    features: int
    kernel_size: Tuple[int, int]
    mask_type: str = "B"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mask = jnp.asarray(make_conv_mask(kh, kw, cin, self.features,
                                          self.mask_type))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), (kernel * mask).astype(self.dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class GatedResBlock(nn.Module):
    """1x1 -> masked k3 -> gated tanh*sigmoid, residual
    (pixelcnn_prior.py:57-88)."""

    channels: int
    kernel_size: int = 3
    dtype: Any = jnp.float32

    def setup(self):
        half = self.channels // 2
        self.conv1 = nn.Conv(half, (1, 1), dtype=self.dtype, name="conv1")
        self.conv2 = MaskedConv(half, (self.kernel_size, self.kernel_size),
                                "B", dtype=self.dtype, name="conv2")
        self.conv_gate = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                                 name="conv_gate")
        self.conv_feature = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                                    name="conv_feature")

    def __call__(self, x: Array) -> Array:
        out = nn.relu(self.conv1(x))
        out = nn.relu(self.conv2(out))
        gate = jax.nn.sigmoid(self.conv_gate(out))
        feature = jnp.tanh(self.conv_feature(out))
        return x + gate * feature


class CausalAttention(nn.Module):
    """Causal MHA over the flattened raster sequence
    (pixelcnn_prior.py:91-132). Inclusive diagonal (self-attention allowed)."""

    channels: int
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Any = jnp.float32
    # "output" (default): flash path + dropout on the attention output —
    # measured quality-equivalent to the reference's weight dropout (BENCH.md
    # r1 semantics A/B: delta inside the seed spread) and 1.73x faster at the
    # production prior shape (scripts/prior_attn_ab.py: the dense path
    # materializes B*H*L*L weights and draws threefry bits for each).
    # "weights": reference-exact attention-WEIGHT dropout
    # (pixelcnn_prior.py:126-127) at L <= DENSE_ATTENTION_MAX_L.
    attn_dropout_mode: str = "output"

    def setup(self):
        self.head_dim = self.channels // self.num_heads
        pd = self.head_dim * self.num_heads
        self.q_proj = nn.Dense(pd, dtype=self.dtype, name="q_proj")
        self.k_proj = nn.Dense(pd, dtype=self.dtype, name="k_proj")
        self.v_proj = nn.Dense(pd, dtype=self.dtype, name="v_proj")
        self.out_proj = nn.Dense(self.channels, dtype=self.dtype,
                                 name="out_proj")
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x: Array, train: bool = False) -> Array:
        b, h, w, c = x.shape
        L = h * w
        xf = x.reshape(b, L, c)
        nh, hd = self.num_heads, self.head_dim

        def split(t):
            return t.reshape(b, L, nh, hd).transpose(0, 2, 1, 3)

        q, k, v = split(self.q_proj(xf)), split(self.k_proj(xf)), split(
            self.v_proj(xf))
        sm_scale = 1.0 / float(hd) ** 0.5
        from movae_tpu.parallel.context import get_context_parallel
        ctx = get_context_parallel()
        if (self.dropout > 0.0 and train
                and self.attn_dropout_mode == "weights"
                and L <= DENSE_ATTENTION_MAX_L
                and (ctx is None or ctx.size <= 1)):
            # (under context parallelism the ring path + output dropout is
            # used even at short L — the dense weight-dropout matrix would
            # be materialized replicated, defeating the sequence sharding)
            # reference semantics: dropout on attention weights
            # (pixelcnn_prior.py:126-127) — requires the dense L x L matrix,
            # so it is restricted to short sequences where dense is the
            # dispatch anyway (ops/attention.py dense_threshold)
            attn = jnp.einsum("bnld,bnmd->bnlm", q, k) * sm_scale
            causal = jnp.tril(jnp.ones((L, L), bool))
            attn = jnp.where(causal[None, None], attn, -jnp.inf)
            attn = jax.nn.softmax(attn, axis=-1)
            attn = self.drop(attn, deterministic=False)
            out = jnp.einsum("bnlm,bnmd->bnld", attn, v)
        else:
            # memory-scalable path (flash kernel / blockwise scan for long
            # L). Attention-weight dropout would force the dense O(L^2)
            # matrix (B*H*4096^2 floats at the ImageNet bottom level — OOM,
            # and the exact pattern the flash kernel exists to avoid), so at
            # long L the regularization is applied to the attention OUTPUT
            # instead — the standard flash-compatible approximation.
            from movae_tpu.ops.attention import causal_attention
            out = causal_attention(q, k, v, sm_scale)
            if self.dropout > 0.0 and train:
                out = self.drop(out, deterministic=False)
        # the reference flattens the attention output DIM-MAJOR — its
        # out.permute(0,2,3,1).reshape(B,L,proj_dim) interleaves as
        # (head_dim, heads), not (heads, head_dim)
        # (pixelcnn_prior.py:129-131); out_proj weights are layout-bound,
        # so forward parity requires the same interleave (r4: this was the
        # step-0 CE gap in the PixelSNAIL stage-2 lockstep)
        out = out.transpose(0, 2, 3, 1).reshape(b, L, nh * hd)
        return self.out_proj(out).reshape(b, h, w, c)


class PixelSNAILBlock(nn.Module):
    """Residual blocks + causal attention + merge (pixelcnn_prior.py:135-152)."""

    channels: int
    num_res_blocks: int = 2
    num_heads: int = 8
    dropout: float = 0.1
    dtype: Any = jnp.float32
    attn_dropout_mode: str = "output"

    def setup(self):
        self.res_blocks = [
            GatedResBlock(self.channels, dtype=self.dtype, name=f"res_{i}")
            for i in range(self.num_res_blocks)
        ]
        self.attention = CausalAttention(self.channels, self.num_heads,
                                         self.dropout, dtype=self.dtype,
                                         attn_dropout_mode=
                                         self.attn_dropout_mode,
                                         name="attention")
        self.out_conv = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                                name="out_conv")

    def __call__(self, x: Array, train: bool = False) -> Array:
        for blk in self.res_blocks:
            x = blk(x)
        attn = self.attention(x, train=train)
        return self.out_conv(jnp.concatenate([x, attn], axis=-1)) + x


def _pos_encoding(h: int, w: int) -> np.ndarray:
    """Row/col coordinates normalized around zero, (1, H, W, 2)
    (pixelcnn_prior.py:195-201)."""
    ch = (np.arange(h, dtype=np.float32) - h / 2) / max(h, 1)
    cw = (np.arange(w, dtype=np.float32) - w / 2) / max(w, 1)
    pos = np.stack(np.broadcast_arrays(ch[:, None], cw[None, :]), axis=-1)
    return pos[None]


class PixelCNN(nn.Module):
    """Gated PixelCNN over code grids (pixelcnn_prior.py:240-312)."""

    num_embeddings: int
    embedding_dim: int = 64
    hidden_channels: int = 128
    num_layers: int = 15
    kernel_size: int = 7
    conditional_channels: int = 0
    dtype: Any = jnp.float32

    def setup(self):
        self.embedding = GatherEmbed(self.num_embeddings, self.embedding_dim,
                                      name="embedding")
        self.conv_in = MaskedConv(self.hidden_channels,
                                  (self.kernel_size, self.kernel_size), "A",
                                  dtype=self.dtype, name="conv_in")
        self.res_blocks = [
            GatedResBlock(self.hidden_channels, dtype=self.dtype,
                          name=f"res_{i}")
            for i in range(self.num_layers)
        ]
        self.out1 = nn.Conv(self.hidden_channels, (1, 1), dtype=self.dtype,
                            name="out1")
        self.out2 = nn.Conv(self.num_embeddings, (1, 1), dtype=self.dtype,
                            name="out2")

    def __call__(self, x: Array, condition: Optional[Array] = None,
                 train: bool = False) -> Array:
        from movae_tpu.parallel.context import seq_shard_spatial
        h = self.embedding(x)
        if condition is not None:
            h = jnp.concatenate([h, condition.astype(h.dtype)], axis=-1)
        # under --context_parallel: row-shard the conv trunk over 'seq'
        # (GSPMD halo-exchanges the masked-conv borders; XLA propagates the
        # layout through the residual stack)
        h = seq_shard_spatial(h)
        h = self.conv_in(h)
        for blk in self.res_blocks:
            h = blk(h)
        h = nn.relu(self.out1(nn.relu(h)))
        return self.out2(h).astype(jnp.float32)

    def loss_function(self, x: Array, condition: Optional[Array] = None,
                      train: bool = True) -> Dict[str, Array]:
        logits = self(x, condition, train=train)
        loss = integer_cross_entropy(
            logits.reshape(-1, self.num_embeddings), x.reshape(-1))
        return {"total_loss": loss}


class PixelSNAIL(nn.Module):
    """PixelCNN + causal attention blocks + coordinate channels
    (pixelcnn_prior.py:155-237)."""

    num_embeddings: int
    embedding_dim: int = 64
    hidden_channels: int = 128
    num_blocks: int = 8
    num_res_blocks_per_layer: int = 2
    num_heads: int = 8
    kernel_size: int = 7
    conditional_channels: int = 0
    dropout: float = 0.1
    dtype: Any = jnp.float32
    attn_dropout_mode: str = "output"

    def setup(self):
        self.embedding = GatherEmbed(self.num_embeddings, self.embedding_dim,
                                      name="embedding")
        self.conv_in = MaskedConv(self.hidden_channels,
                                  (self.kernel_size, self.kernel_size), "A",
                                  dtype=self.dtype, name="conv_in")
        self.blocks = [
            PixelSNAILBlock(self.hidden_channels,
                            self.num_res_blocks_per_layer, self.num_heads,
                            self.dropout, dtype=self.dtype,
                            attn_dropout_mode=self.attn_dropout_mode,
                            name=f"block_{i}")
            for i in range(self.num_blocks)
        ]
        self.out1 = nn.Conv(self.hidden_channels, (1, 1), dtype=self.dtype,
                            name="out1")
        self.out2 = nn.Conv(self.num_embeddings, (1, 1), dtype=self.dtype,
                            name="out2")

    def __call__(self, x: Array, condition: Optional[Array] = None,
                 train: bool = False) -> Array:
        from movae_tpu.parallel.context import seq_shard_spatial
        b, hh, ww = x.shape
        h = self.embedding(x)
        pos = jnp.broadcast_to(jnp.asarray(_pos_encoding(hh, ww)),
                               (b, hh, ww, 2)).astype(h.dtype)
        h = jnp.concatenate([h, pos], axis=-1)
        if condition is not None:
            h = jnp.concatenate([h, condition.astype(h.dtype)], axis=-1)
        # row-shard the conv trunk over 'seq' under --context_parallel (see
        # PixelCNN.__call__); the (B, L, C) reshape in CausalAttention then
        # feeds the ring path already sequence-sharded
        h = seq_shard_spatial(h)
        h = self.conv_in(h)
        for blk in self.blocks:
            h = h + blk(h, train=train)
        h = nn.relu(self.out1(nn.relu(h)))
        return self.out2(h).astype(jnp.float32)

    def loss_function(self, x: Array, condition: Optional[Array] = None,
                      train: bool = True) -> Dict[str, Array]:
        logits = self(x, condition, train=train)
        loss = integer_cross_entropy(
            logits.reshape(-1, self.num_embeddings), x.reshape(-1))
        return {"total_loss": loss}


class HierarchicalPixelCNN(nn.Module):
    """Two-level prior P(z_top) * P(z_bottom|z_top) for VQ-VAE2
    (pixelcnn_prior.py:352-431)."""

    num_embeddings: int
    embedding_dim: int = 64
    hidden_channels: int = 128
    num_layers: int = 15
    dtype: Any = jnp.float32

    @nn.nowrap
    def make_top_module(self) -> "PixelCNN":
        """Unbound twin of ``prior_top`` — the single config source for
        both setup() and the standalone samplers (sample_hierarchical)."""
        return PixelCNN(self.num_embeddings, self.embedding_dim,
                        self.hidden_channels, self.num_layers,
                        dtype=self.dtype)

    @nn.nowrap
    def make_bottom_module(self) -> "PixelCNN":
        """Unbound twin of ``prior_bottom``."""
        return PixelCNN(self.num_embeddings, self.embedding_dim,
                        self.hidden_channels, self.num_layers,
                        conditional_channels=self.embedding_dim,
                        dtype=self.dtype)

    def setup(self):
        self.prior_top = self.make_top_module()
        self.embedding_top = GatherEmbed(self.num_embeddings, self.embedding_dim,
                                          name="embedding_top")
        self.upsample_top = nn.ConvTranspose(
            self.embedding_dim, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype, name="upsample_top")
        self.prior_bottom = self.make_bottom_module()

    def condition_from_top(self, z_top: Array) -> Array:
        return self.upsample_top(self.embedding_top(z_top))

    def __call__(self, z_top: Array, z_bottom: Array,
                 train: bool = False) -> Dict[str, Array]:
        cond = self.condition_from_top(z_top)
        return {"logits_top": self.prior_top(z_top, train=train),
                "logits_bottom": self.prior_bottom(z_bottom, cond,
                                                   train=train)}

    def loss_function(self, z_top: Array, z_bottom: Array,
                      train: bool = True) -> Dict[str, Array]:
        out = self(z_top, z_bottom, train=train)
        k = self.num_embeddings
        lt = integer_cross_entropy(
            out["logits_top"].reshape(-1, k), z_top.reshape(-1))
        lb = integer_cross_entropy(
            out["logits_bottom"].reshape(-1, k), z_bottom.reshape(-1))
        return {"loss_top": lt, "loss_bottom": lb, "total_loss": lt + lb}


class HierarchicalPixelSNAIL(nn.Module):
    """Attention top prior, conv bottom prior (pixelcnn_prior.py:434-554,
    per the VQ-VAE-2 paper)."""

    num_embeddings: int
    embedding_dim: int = 64
    hidden_channels: int = 128
    num_blocks_top: int = 8
    num_res_blocks_per_layer: int = 2
    num_heads: int = 8
    num_layers_bottom: int = 15
    dropout: float = 0.1
    dtype: Any = jnp.float32
    attn_dropout_mode: str = "output"

    @nn.nowrap
    def make_top_module(self) -> "PixelSNAIL":
        """Unbound twin of ``prior_top`` — the single config source for
        both setup() and the standalone samplers (sample_hierarchical)."""
        return PixelSNAIL(
            self.num_embeddings, self.embedding_dim, self.hidden_channels,
            self.num_blocks_top, self.num_res_blocks_per_layer,
            self.num_heads, dropout=self.dropout, dtype=self.dtype,
            attn_dropout_mode=self.attn_dropout_mode)

    @nn.nowrap
    def make_bottom_module(self) -> "PixelCNN":
        """Unbound twin of ``prior_bottom``."""
        return PixelCNN(
            self.num_embeddings, self.embedding_dim, self.hidden_channels,
            self.num_layers_bottom, conditional_channels=self.embedding_dim,
            dtype=self.dtype)

    def setup(self):
        self.prior_top = self.make_top_module()
        self.embedding_top = GatherEmbed(self.num_embeddings, self.embedding_dim,
                                          name="embedding_top")
        self.upsample_top = nn.ConvTranspose(
            self.embedding_dim, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype, name="upsample_top")
        self.prior_bottom = self.make_bottom_module()

    def condition_from_top(self, z_top: Array) -> Array:
        return self.upsample_top(self.embedding_top(z_top))

    def __call__(self, z_top: Array, z_bottom: Array,
                 train: bool = False) -> Dict[str, Array]:
        cond = self.condition_from_top(z_top)
        return {"logits_top": self.prior_top(z_top, train=train),
                "logits_bottom": self.prior_bottom(z_bottom, cond,
                                                   train=train)}

    def loss_function(self, z_top: Array, z_bottom: Array,
                      train: bool = True) -> Dict[str, Array]:
        out = self(z_top, z_bottom, train=train)
        k = self.num_embeddings
        lt = integer_cross_entropy(
            out["logits_top"].reshape(-1, k), z_top.reshape(-1))
        lb = integer_cross_entropy(
            out["logits_bottom"].reshape(-1, k), z_bottom.reshape(-1))
        return {"loss_top": lt, "loss_bottom": lb, "total_loss": lt + lb}


# ===========================================================================
# Sampling
# ===========================================================================

def sample_naive(model, params, rng: Array, batch_size: int, height: int,
                 width: int, condition: Optional[Array] = None,
                 temperature: float = 1.0) -> Array:
    """Reference-style raster sampling (full forward per pixel,
    pixelcnn_prior.py:314-349) but as one compiled fori_loop. Works for any
    prior; use :func:`sample_fast` for the cached PixelCNN path.

    All samplers in this module draw pixel t with the key
    ``fold_in(rng, t)`` — an order-independent stream, so the raster,
    cached, and wavefront samplers produce identical codes for the same
    rng (the equality the tests pin)."""

    def body(idx, carry):
        samples = carry
        i, j = idx // width, idx % width
        logits = model.apply({"params": params}, samples, condition,
                             train=False)
        logits_p = jax.lax.dynamic_slice(
            logits, (0, i, j, 0), (batch_size, 1, 1, model.num_embeddings)
        ).reshape(batch_size, model.num_embeddings) / temperature
        sub = jax.random.fold_in(rng, idx)
        code = jax.random.categorical(sub, logits_p, axis=-1)
        samples = jax.lax.dynamic_update_slice(
            samples, code.reshape(batch_size, 1, 1).astype(samples.dtype),
            (0, i, j))
        return samples

    from movae_tpu.parallel.context import shard_sample_batch
    samples0 = shard_sample_batch(
        jnp.zeros((batch_size, height, width), jnp.int32))
    return jax.lax.fori_loop(0, height * width, body, samples0)


# --- fast cached PixelCNN sampler -------------------------------------------

def _masked_weights_flat(kernel: Array, mask_type: str) -> Array:
    """(kh,kw,cin,cout) kernel -> (kh*kw*cin, cout) with the causal mask."""
    kh, kw, cin, cout = kernel.shape
    mask = jnp.asarray(make_conv_mask(kh, kw, cin, cout, mask_type))
    return (kernel * mask).reshape(kh * kw * cin, cout)


def sample_fast(model: PixelCNN, params, rng: Array, batch_size: int,
                height: int, width: int, condition: Optional[Array] = None,
                temperature: float = 1.0) -> Array:
    """Incremental-cache raster sampler for PixelCNN.

    Per pixel, each layer computes ONE output vector from a cached k x k
    neighborhood (dynamic slice + small matmul) instead of a full-plane
    convolution. Caches are padded so no bounds checks are needed.
    """
    p = params
    K = model.num_embeddings
    k_in = model.kernel_size
    pad_in = k_in // 2
    hc = model.hidden_channels
    half = hc // 2
    n_layers = model.num_layers
    cin = model.embedding_dim + (condition.shape[-1]
                                 if condition is not None else 0)

    emb_table = p["embedding"]["embedding"]
    w_in = _masked_weights_flat(p["conv_in"]["kernel"], "A")
    b_in = p["conv_in"]["bias"]

    w1 = jnp.stack([p[f"res_{l}"]["conv1"]["kernel"].reshape(hc, half)
                    for l in range(n_layers)])
    b1 = jnp.stack([p[f"res_{l}"]["conv1"]["bias"] for l in range(n_layers)])
    w2 = jnp.stack([_masked_weights_flat(p[f"res_{l}"]["conv2"]["kernel"], "B")
                    for l in range(n_layers)])
    b2 = jnp.stack([p[f"res_{l}"]["conv2"]["bias"] for l in range(n_layers)])
    # gate and feature 1x1 convs share their input: concatenating their
    # output columns into ONE matmul halves the per-layer op count and is
    # bitwise identical per column (each output column keeps its own
    # reduction, so no summation order changes).
    wgf = jnp.stack([jnp.concatenate(
        [p[f"res_{l}"]["conv_gate"]["kernel"].reshape(half, hc),
         p[f"res_{l}"]["conv_feature"]["kernel"].reshape(half, hc)], axis=1)
        for l in range(n_layers)])
    bgf = jnp.stack([jnp.concatenate(
        [p[f"res_{l}"]["conv_gate"]["bias"],
         p[f"res_{l}"]["conv_feature"]["bias"]])
        for l in range(n_layers)])
    wo1 = p["out1"]["kernel"].reshape(hc, hc)
    bo1 = p["out1"]["bias"]
    wo2 = p["out2"]["kernel"].reshape(hc, K)
    bo2 = p["out2"]["bias"]

    # caches: padded input plane + per-layer conv1-output planes (k3 pad 1)
    in_cache0 = jnp.zeros((batch_size, height + 2 * pad_in,
                           width + 2 * pad_in, cin), jnp.float32)
    if condition is not None:
        cond_pad = jnp.pad(condition.astype(jnp.float32),
                           ((0, 0), (pad_in, pad_in), (pad_in, pad_in),
                            (0, 0)))
        in_cache0 = in_cache0.at[..., model.embedding_dim:].set(cond_pad)
    c1_cache0 = jnp.zeros((n_layers, batch_size, height + 2, width + 2, half),
                          jnp.float32)
    samples0 = jnp.zeros((batch_size, height, width), jnp.int32)
    # under sample_parallel: batch-shard the canvas + caches so the whole
    # per-pixel loop runs data-parallel over the mesh (no collectives)
    from movae_tpu.parallel.context import shard_sample_batch
    in_cache0 = shard_sample_batch(in_cache0)
    c1_cache0 = shard_sample_batch(c1_cache0, batch_dim=1)
    samples0 = shard_sample_batch(samples0)

    def body(idx, carry):
        samples, in_cache, c1_cache = carry
        i, j = idx // width, idx % width

        nb = jax.lax.dynamic_slice(
            in_cache, (0, i, j, 0), (batch_size, k_in, k_in, cin))
        x = nb.reshape(batch_size, -1) @ w_in + b_in          # (B, hc)

        def layer_exact(l, xc):
            x, c1_cache = xc
            c1 = nn.relu(x @ w1[l] + b1[l])
            c1_cache = jax.lax.dynamic_update_slice(
                c1_cache, c1.reshape(1, batch_size, 1, 1, half),
                (l, 0, i + 1, j + 1, 0))
            nb2 = jax.lax.dynamic_slice(
                c1_cache, (l, 0, i, j, 0), (1, batch_size, 3, 3, half))
            c2 = nn.relu(nb2.reshape(batch_size, -1) @ w2[l] + b2[l])
            gf = c2 @ wgf[l] + bgf[l]
            gate = jax.nn.sigmoid(gf[:, :hc])
            feat = jnp.tanh(gf[:, hc:])
            return x + gate * feat, c1_cache

        x, c1_cache = jax.lax.fori_loop(0, n_layers, layer_exact,
                                        (x, c1_cache))
        h = nn.relu(nn.relu(x) @ wo1 + bo1)
        logits = (h @ wo2 + bo2) / temperature                # (B, K)
        sub = jax.random.fold_in(rng, idx)
        code = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        samples = jax.lax.dynamic_update_slice(
            samples, code.reshape(batch_size, 1, 1), (0, i, j))
        emb = jnp.take(emb_table, code, axis=0)               # (B, E)
        in_cache = jax.lax.dynamic_update_slice(
            in_cache,
            emb.reshape(batch_size, 1, 1, model.embedding_dim).astype(
                jnp.float32),
            (0, i + pad_in, j + pad_in, 0))
        return samples, in_cache, c1_cache

    samples, _, _ = jax.lax.fori_loop(
        0, height * width, body, (samples0, in_cache0, c1_cache0))
    return samples


def sample_wavefront(model: PixelCNN, params, rng: Array, batch_size: int,
                     height: int, width: int,
                     condition: Optional[Array] = None,
                     temperature: float = 1.0) -> Array:
    """Skew-diagonal (wavefront) cached sampler for PixelCNN.

    The masked convolutions' dependency structure admits the skew order
    ``d = s*i + j`` with ``s = kernel_size//2 + 1``: the mask-A input
    conv's worst dependency is (i-1, j + kernel_size//2), on front
    ``d - 1``; the k3 mask-B residual convs need only s >= 2. Every input
    a pixel can see therefore lies on a strictly EARLIER front, so all
    cells of one front are sampled in a single step: the H*W sequential
    raster steps of :func:`sample_fast` collapse to ``s*(H-1) + W``
    fronts of up-to-ceil(W/s)-cell batched work (256 -> 75 steps at
    16x16, 4096 -> 316 at 64x64 — the VQ-VAE-2 bottom level). The
    reference runs one FULL forward per raster pixel
    (pixelcnn_prior.py:314-349). Attention forbids this reordering for
    PixelSNAIL: a raster-causal key can lie on a later front (e.g.
    (i-1, W-1) for query (i, 0)).

    TPU design notes (this is the hot px/s path):
    - Activation caches live in SKEWED coordinates, where a front is one
      contiguous column and its valid cells are a contiguous row range —
      every access is a static-shape ``dynamic_slice`` /
      ``dynamic_update_slice``; NO scatter/gather ops (an earlier
      scatter-based draft measured 14x SLOWER than the raster sampler:
      XLA scatter serializes on TPU).
    - Columns are ring-buffered with the double-write trick (each column
      written at ``d mod P`` and ``d mod P + P``), so any window of the
      last P columns is physically contiguous; memory stays O(P) per
      plane instead of O(s*H + W).
    - Reads use the FULL k x k windows against mask-zeroed weights (same
      reduction shapes as the raster sampler). Stale ring columns under
      zero taps contribute exact +/-0, so logits match the raster
      sampler bitwise; dead cells are zero-masked on write to preserve
      the conv padding semantics.
    - Per-pixel fold_in keys make the categorical draws order-
      independent, so this samples IDENTICAL codes to
      sample_fast/sample_naive for the same rng (equality tested).
    """
    p = params
    K = model.num_embeddings
    k_in = model.kernel_size
    pad_in = k_in // 2
    hc = model.hidden_channels
    half = hc // 2
    n_layers = model.num_layers
    cin = model.embedding_dim + (condition.shape[-1]
                                 if condition is not None else 0)
    B = batch_size
    s = max(pad_in + 1, 2)
    C = min(height, -(-width // s))            # max cells per front
    D = s * (height - 1) + width               # number of fronts
    P_in = pad_in * (s + 1) + 1                # ring periods
    P_c1 = s + 2

    emb_table = p["embedding"]["embedding"]
    # kernel rows BELOW the pixel are fully mask-zeroed — drop their taps
    # (and their cache slices in the loop): the input conv keeps rows
    # i-pad..i (28 of 49 taps at k7), the c1 conv rows i-1..i (6 of 9)
    w_in = _masked_weights_flat(p["conv_in"]["kernel"],
                                "A")[: (pad_in + 1) * k_in * cin]
    b_in = p["conv_in"]["bias"]
    w1 = jnp.stack([p[f"res_{l}"]["conv1"]["kernel"].reshape(hc, half)
                    for l in range(n_layers)])
    b1 = jnp.stack([p[f"res_{l}"]["conv1"]["bias"] for l in range(n_layers)])
    w2 = jnp.stack([_masked_weights_flat(
        p[f"res_{l}"]["conv2"]["kernel"], "B")[: 6 * half]
        for l in range(n_layers)])
    b2 = jnp.stack([p[f"res_{l}"]["conv2"]["bias"] for l in range(n_layers)])
    wgf = jnp.stack([jnp.concatenate(
        [p[f"res_{l}"]["conv_gate"]["kernel"].reshape(half, hc),
         p[f"res_{l}"]["conv_feature"]["kernel"].reshape(half, hc)], axis=1)
        for l in range(n_layers)])
    bgf = jnp.stack([jnp.concatenate(
        [p[f"res_{l}"]["conv_gate"]["bias"],
         p[f"res_{l}"]["conv_feature"]["bias"]])
        for l in range(n_layers)])
    wo1 = p["out1"]["kernel"].reshape(hc, hc)
    bo1 = p["out1"]["bias"]
    wo2 = p["out2"]["kernel"].reshape(hc, K)
    bo2 = p["out2"]["bias"]

    # skewed ring caches; rows = pad above + H + C below (writes start at
    # row i_min <= H-1 with height C and must never clamp)
    in_cache0 = jnp.zeros((B, pad_in + height + C + pad_in, 2 * P_in, cin),
                          jnp.float32)
    c1_cache0 = jnp.zeros((n_layers, B, 1 + height + C, 2 * P_c1, half),
                          jnp.float32)
    # sampled codes in skewed layout (unskewed once at the end)
    skew0 = jnp.zeros((B, height + C, D), jnp.int32)
    from movae_tpu.parallel.context import shard_sample_batch
    in_cache0 = shard_sample_batch(in_cache0)
    c1_cache0 = shard_sample_batch(c1_cache0, batch_dim=1)
    skew0 = shard_sample_batch(skew0)
    if condition is not None:
        # pre-skew the conditioning plane: cond_skew[b,i,d] = cond[b,i,d-s*i]
        ii_all = jnp.arange(height)[:, None]
        dd_all = jnp.arange(D)[None, :]
        jj_all = dd_all - s * ii_all                       # (H, D)
        cond_ok = (jj_all >= 0) & (jj_all < width)
        gath = jnp.take_along_axis(
            condition.astype(jnp.float32),
            jnp.clip(jj_all, 0, width - 1)[None, :, :, None], axis=2)
        cond_skew = jnp.where(cond_ok[None, :, :, None], gath, 0.0)
        cond_skew = jnp.pad(cond_skew, ((0, 0), (0, C), (0, 0), (0, 0)))
    cells = jnp.arange(C)

    def body(d, carry):
        skew, in_cache, c1_cache = carry
        i_min = jnp.maximum(0, -((width - 1 - d) // s))
        ii = i_min + cells                                  # (C,)
        jj = d - s * ii
        valid = jj >= 0                                     # ii<H implied
        vmask = valid[None, :, None].astype(jnp.float32)    # (1,C,1)

        # input conv: k-wide windows of rows i-pad..i per cell; row a's
        # taps sit at skewed columns d + a*s - pad .. + pad (stale/future
        # columns meet zero mask taps)
        nb = jnp.concatenate([
            jax.lax.dynamic_slice(
                in_cache,
                (0, i_min + pad_in + a, jnp.mod(d + a * s - pad_in, P_in), 0),
                (B, C, k_in, cin))
            for a in range(-pad_in, 1)], axis=2)   # (B,C,(pad+1)*k,cin)
        x = nb.reshape(B, C, -1) @ w_in + b_in              # (B,C,hc)

        def layer_exact(l, xc):
            x, c1_cache = xc
            c1 = nn.relu(x @ w1[l] + b1[l]) * vmask         # (B,C,half)
            m = jnp.mod(d, P_c1)
            v = c1[None, :, :, None, :]                     # (1,B,C,1,half)
            c1_cache = jax.lax.dynamic_update_slice(
                c1_cache, v, (l, 0, i_min + 1, m, 0))
            c1_cache = jax.lax.dynamic_update_slice(
                c1_cache, v, (l, 0, i_min + 1, m + P_c1, 0))
            nb2 = jnp.concatenate([
                jax.lax.dynamic_slice(
                    c1_cache,
                    (l, 0, i_min + 1 + a, jnp.mod(d + a * s - 1, P_c1), 0),
                    (1, B, C, 3, half))
                for a in (-1, 0)], axis=3)                  # (1,B,C,6,half)
            c2 = nn.relu(nb2.reshape(B, C, -1) @ w2[l] + b2[l])
            gf = c2 @ wgf[l] + bgf[l]
            gate = jax.nn.sigmoid(gf[..., :hc])
            feat = jnp.tanh(gf[..., hc:])
            return x + gate * feat, c1_cache

        x, c1_cache = jax.lax.fori_loop(0, n_layers, layer_exact,
                                        (x, c1_cache))
        h = nn.relu(nn.relu(x) @ wo1 + bo1)
        logits = (h @ wo2 + bo2) / temperature              # (B,C,K)
        keys = jax.vmap(lambda t: jax.random.fold_in(rng, t))(
            ii * width + jj)
        code = jax.vmap(
            lambda k, lg: jax.random.categorical(k, lg, axis=-1))(
                keys, logits.transpose(1, 0, 2)).astype(jnp.int32)  # (C,B)
        skew = jax.lax.dynamic_update_slice(
            skew, code.T[:, :, None], (0, i_min, d))
        emb = jnp.take(emb_table, code.T, axis=0) * vmask   # (B,C,E)
        if condition is not None:
            cond_col = jax.lax.dynamic_slice(
                cond_skew, (0, i_min, d, 0),
                (B, C, 1, cond_skew.shape[-1]))[:, :, 0, :]
            col = jnp.concatenate([emb, cond_col], axis=-1)
        else:
            col = emb
        m = jnp.mod(d, P_in)
        v = col[:, :, None, :]                              # (B,C,1,cin)
        in_cache = jax.lax.dynamic_update_slice(
            in_cache, v, (0, i_min + pad_in, m, 0))
        in_cache = jax.lax.dynamic_update_slice(
            in_cache, v, (0, i_min + pad_in, m + P_in, 0))
        return skew, in_cache, c1_cache

    skew, _, _ = jax.lax.fori_loop(0, D, body, (skew0, in_cache0, c1_cache0))
    # unskew: samples[b,i,j] = skew[b,i,s*i+j]
    idx = (s * jnp.arange(height)[:, None]
           + jnp.arange(width)[None, :])                    # (H,W)
    return jnp.take_along_axis(skew[:, :height, :],
                               idx[None, :, :], axis=2)


def sample_fast_snail(model: PixelSNAIL, params, rng: Array, batch_size: int,
                      height: int, width: int,
                      condition: Optional[Array] = None,
                      temperature: float = 1.0,
                      cache_dtype: Any = jnp.int8,
                      forced: Optional[Array] = None,
                      return_logits: bool = False) -> Array:
    """Incremental-cache raster sampler for PixelSNAIL.

    Same design as :func:`sample_fast` (per-pixel neighborhood slices of
    padded activation caches instead of full-plane convs) plus a **KV cache**
    per attention block: at pixel t each block appends (k_t, v_t) and the
    query attends over keys 0..t with a static-shape mask — O(L) attention
    work per pixel instead of the reference's full L x L matrix per pixel
    (pixelcnn_prior.py:334-349 runs the whole network once per pixel).

    The per-pixel step is HBM-bound on the KV-cache reads: the causal mask
    hides keys > t but the static-shape einsum still reads all L of them,
    so at bs 256 / L 256 / 8 blocks the f32 caches cost ~0.5 GB of HBM
    traffic per pixel. ``cache_dtype=bfloat16`` halves that; the
    q.K and probs.V einsums accumulate in f32 on the MXU
    (``preferred_element_type``), activations and softmax stay f32. Pass
    ``cache_dtype=jnp.float32`` for bitwise equality with
    :func:`sample_naive` (tested both ways).

    ``cache_dtype=jnp.int8`` (default) halves the cache bytes again: each
    (k_t, v_t) row is stored as int8 with its own per-(batch, head)
    max-abs scale (f32 side cache: one 4-byte scale per hd-byte row,
    +4/hd relative overhead). The per-ROW scales factor out of both
    attention einsums — ``logits_j = (q . k8_j) * s^k_j`` and ``attn =
    sum_j (p_j * s^v_j) v8_j`` — so the cached rows stream from HBM as
    int8 and widen to bf16 in-register (exact: |k8| <= 127 fits bf16's
    8-bit mantissa; the query takes the same lossy f32->bf16 cast as the
    bf16 arm). Measured on v5e (bs 256, 16x16, 8 blocks, interleaved
    medians, scripts/snail_sampler_ab.py): int8 1.17x over bf16 at S=4
    and 1.20x at S=8 — confirming XLA does fuse the widening astype into
    the einsum operand load — 697k px/s at the production int8-seg8
    configuration vs 260k for f32-seg1 (2.7x). Quantization noise is
    ~0.4% relative per row (comparable to bf16 rounding); sampled codes
    agreed exactly with the f32 path in the 5x5 check (the test enforces
    >= 0.7 agreement). CLIs expose the choice as ``--kv_cache_dtype``.

    ``forced`` (B, H, W) int32 switches the loop to teacher-forced scoring:
    each pixel's code is read from ``forced`` instead of sampled, so the
    network sees the given sequence as its own autoregressive history.
    ``return_logits=True`` additionally collects the per-pixel
    (post-temperature) logits into a (B, H, W, K) f32 buffer and returns
    ``(samples, logits)``. Together they measure the *distributional*
    perturbation a lossy ``cache_dtype`` introduces at every pixel of a
    fixed sequence — the per-pixel KL study in scripts/kv_quality_study.py
    (r2 VERDICT weak-item 4) — without sampling stochasticity in the way.
    """
    p = params
    K = model.num_embeddings
    k_in = model.kernel_size
    pad_in = k_in // 2
    hc = model.hidden_channels
    half = hc // 2
    nb_blocks = model.num_blocks
    n_res = model.num_res_blocks_per_layer
    nh = model.num_heads
    hd = hc // nh
    pd = nh * hd
    L = height * width
    cc = condition.shape[-1] if condition is not None else 0
    cin = model.embedding_dim + 2 + cc  # emb ++ pos(2) ++ cond

    emb_table = p["embedding"]["embedding"]
    w_in = _masked_weights_flat(p["conv_in"]["kernel"], "A")
    b_in = p["conv_in"]["bias"]

    def stack_res(name_fn):
        return jnp.stack([jnp.stack([name_fn(l, r) for r in range(n_res)])
                          for l in range(nb_blocks)])

    blk = lambda l: p[f"block_{l}"]
    w1 = stack_res(lambda l, r: blk(l)[f"res_{r}"]["conv1"]["kernel"]
                   .reshape(hc, half))
    b1 = stack_res(lambda l, r: blk(l)[f"res_{r}"]["conv1"]["bias"])
    w2 = stack_res(lambda l, r: _masked_weights_flat(
        blk(l)[f"res_{r}"]["conv2"]["kernel"], "B"))
    b2 = stack_res(lambda l, r: blk(l)[f"res_{r}"]["conv2"]["bias"])
    # gate/feature and q/k/v projections share their inputs — fuse each
    # group into one matmul (bitwise identical per output column)
    wgf = stack_res(lambda l, r: jnp.concatenate(
        [blk(l)[f"res_{r}"]["conv_gate"]["kernel"].reshape(half, hc),
         blk(l)[f"res_{r}"]["conv_feature"]["kernel"].reshape(half, hc)],
        axis=1))
    bgf = stack_res(lambda l, r: jnp.concatenate(
        [blk(l)[f"res_{r}"]["conv_gate"]["bias"],
         blk(l)[f"res_{r}"]["conv_feature"]["bias"]]))

    wqkv = jnp.stack([jnp.concatenate(
        [blk(l)["attention"]["q_proj"]["kernel"],
         blk(l)["attention"]["k_proj"]["kernel"],
         blk(l)["attention"]["v_proj"]["kernel"]], axis=1)
        for l in range(nb_blocks)])
    bqkv = jnp.stack([jnp.concatenate(
        [blk(l)["attention"]["q_proj"]["bias"],
         blk(l)["attention"]["k_proj"]["bias"],
         blk(l)["attention"]["v_proj"]["bias"]])
        for l in range(nb_blocks)])
    wo = jnp.stack([blk(l)["attention"]["out_proj"]["kernel"]
                    for l in range(nb_blocks)])
    bo = jnp.stack([blk(l)["attention"]["out_proj"]["bias"]
                    for l in range(nb_blocks)])
    woc = jnp.stack([blk(l)["out_conv"]["kernel"].reshape(2 * hc, hc)
                     for l in range(nb_blocks)])
    boc = jnp.stack([blk(l)["out_conv"]["bias"] for l in range(nb_blocks)])
    wo1 = p["out1"]["kernel"].reshape(hc, hc)
    bo1 = p["out1"]["bias"]
    wo2 = p["out2"]["kernel"].reshape(hc, K)
    bo2 = p["out2"]["bias"]
    sm_scale = 1.0 / float(hd) ** 0.5

    # padded input-plane cache with pos (+ condition) channels pre-written
    in_cache0 = jnp.zeros((batch_size, height + 2 * pad_in,
                           width + 2 * pad_in, cin), jnp.float32)
    pos = jnp.broadcast_to(jnp.asarray(_pos_encoding(height, width)),
                           (batch_size, height, width, 2)).astype(jnp.float32)
    pos_pad = jnp.pad(pos, ((0, 0), (pad_in, pad_in), (pad_in, pad_in),
                            (0, 0)))
    in_cache0 = in_cache0.at[..., model.embedding_dim:
                             model.embedding_dim + 2].set(pos_pad)
    if condition is not None:
        cond_pad = jnp.pad(condition.astype(jnp.float32),
                           ((0, 0), (pad_in, pad_in), (pad_in, pad_in),
                            (0, 0)))
        in_cache0 = in_cache0.at[..., model.embedding_dim + 2:].set(cond_pad)

    c1_cache0 = jnp.zeros((nb_blocks, n_res, batch_size, height + 2,
                           width + 2, half), jnp.float32)
    quant_kv = np.dtype(cache_dtype) == np.dtype(jnp.int8)
    ein_dtype = jnp.bfloat16 if quant_kv else cache_dtype
    k_cache0 = jnp.zeros((nb_blocks, batch_size, nh, L, hd), cache_dtype)
    v_cache0 = jnp.zeros_like(k_cache0)
    # per-row max-abs scales for the int8 cache (1-element dummies kept in
    # the carry otherwise, so both modes share one loop body signature)
    s_shape = (nb_blocks, batch_size, nh, L) if quant_kv else (1, 1, 1, 1)
    ks_cache0 = jnp.zeros(s_shape, jnp.float32)
    vs_cache0 = jnp.zeros(s_shape, jnp.float32)
    samples0 = jnp.zeros((batch_size, height, width), jnp.int32)
    # teacher-forced scoring support (dummy 1-element buffers keep the
    # carry signature identical when unused — same trick as ks/vs above)
    logits0 = (jnp.zeros((batch_size, height, width, K), jnp.float32)
               if return_logits else jnp.zeros((1, 1, 1, 1), jnp.float32))
    from movae_tpu.parallel.context import shard_sample_batch
    in_cache0 = shard_sample_batch(in_cache0)
    c1_cache0 = shard_sample_batch(c1_cache0, batch_dim=2)
    k_cache0 = shard_sample_batch(k_cache0, batch_dim=1)
    v_cache0 = shard_sample_batch(v_cache0, batch_dim=1)
    if quant_kv:
        ks_cache0 = shard_sample_batch(ks_cache0, batch_dim=1)
        vs_cache0 = shard_sample_batch(vs_cache0, batch_dim=1)
    samples0 = shard_sample_batch(samples0)
    if return_logits:
        logits0 = shard_sample_batch(logits0)
    key_pos = jnp.arange(L)

    def make_body(kv_len: int):
        """Per-pixel step whose attention reads only the first ``kv_len``
        cache rows (a STATIC prefix). The raster loop below is split into
        SNAIL_KV_SEGMENTS segments, each compiled with the shortest prefix
        that covers every pixel it contains — the HBM traffic of the KV
        reads (the sampler's bottleneck) drops from L to ~(L+chunk)/2 per
        pixel on average, with zero runtime branching."""

        def body(idx, carry):
            (samples, in_cache, c1_cache, k_cache, v_cache,
             ks_cache, vs_cache, logits_buf) = carry
            i, j = idx // width, idx % width

            nb = jax.lax.dynamic_slice(
                in_cache, (0, i, j, 0), (batch_size, k_in, k_in, cin))
            h = nb.reshape(batch_size, -1) @ w_in + b_in          # (B, hc)

            def block_body(l, carry_b):
                h, c1_cache, k_cache, v_cache, ks_cache, vs_cache = carry_b

                def res_body(r, xc):
                    x, c1_cache = xc
                    c1 = nn.relu(x @ w1[l, r] + b1[l, r])
                    c1_cache = jax.lax.dynamic_update_slice(
                        c1_cache, c1.reshape(1, 1, batch_size, 1, 1, half),
                        (l, r, 0, i + 1, j + 1, 0))
                    nb2 = jax.lax.dynamic_slice(
                        c1_cache, (l, r, 0, i, j, 0),
                        (1, 1, batch_size, 3, 3, half))
                    c2 = nn.relu(nb2.reshape(batch_size, -1) @ w2[l, r]
                                 + b2[l, r])
                    gf = c2 @ wgf[l, r] + bgf[l, r]
                    gate = jax.nn.sigmoid(gf[:, :hc])
                    feat = jnp.tanh(gf[:, hc:])
                    return x + gate * feat, c1_cache

                x, c1_cache = jax.lax.fori_loop(0, n_res, res_body,
                                                (h, c1_cache))

                # attention at pixel t over cached keys 0..t (inclusive);
                # keys t+1..kv_len-1 are masked, keys >= kv_len are outside
                # this segment's static prefix and never read
                qkv = (x @ wqkv[l] + bqkv[l]).reshape(batch_size, 3, nh, hd)
                qt, kt, vt = qkv[:, 0], qkv[:, 1], qkv[:, 2]
                if quant_kv:
                    # per-(batch, head) row scales; s=eps for all-zero rows
                    ks = jnp.maximum(jnp.max(jnp.abs(kt), axis=-1),
                                     1e-8) / 127.0
                    vs = jnp.maximum(jnp.max(jnp.abs(vt), axis=-1),
                                     1e-8) / 127.0
                    kt = jnp.clip(jnp.round(kt / ks[..., None]),
                                  -127, 127)
                    vt = jnp.clip(jnp.round(vt / vs[..., None]),
                                  -127, 127)
                    ks_cache = jax.lax.dynamic_update_slice(
                        ks_cache, ks.reshape(1, batch_size, nh, 1),
                        (l, 0, 0, idx))
                    vs_cache = jax.lax.dynamic_update_slice(
                        vs_cache, vs.reshape(1, batch_size, nh, 1),
                        (l, 0, 0, idx))
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, kt.reshape(1, batch_size, nh, 1, hd).astype(
                        cache_dtype), (l, 0, 0, idx, 0))
                v_cache = jax.lax.dynamic_update_slice(
                    v_cache, vt.reshape(1, batch_size, nh, 1, hd).astype(
                        cache_dtype), (l, 0, 0, idx, 0))
                k_pref = jax.lax.dynamic_slice(
                    k_cache, (l, 0, 0, 0, 0),
                    (1, batch_size, nh, kv_len, hd))[0]
                v_pref = jax.lax.dynamic_slice(
                    v_cache, (l, 0, 0, 0, 0),
                    (1, batch_size, nh, kv_len, hd))[0]
                logits = jnp.einsum(
                    "bnd,bnld->bnl", qt.astype(ein_dtype),
                    k_pref.astype(ein_dtype),
                    preferred_element_type=jnp.float32) * sm_scale
                if quant_kv:
                    # the row scale factors out of q.k8_j (int8 -> bf16 is
                    # exact); fold it into the f32 logits
                    logits = logits * jax.lax.dynamic_slice(
                        ks_cache, (l, 0, 0, 0),
                        (1, batch_size, nh, kv_len))[0]
                logits = jnp.where(key_pos[None, None, :kv_len] <= idx,
                                   logits, -jnp.inf)
                probs = jax.nn.softmax(logits, axis=-1)
                if quant_kv:
                    # attn = sum_j (p_j * s^v_j) v8_j — scale rides the
                    # probability vector, V rows stream from HBM as int8
                    probs = probs * jax.lax.dynamic_slice(
                        vs_cache, (l, 0, 0, 0),
                        (1, batch_size, nh, kv_len))[0]
                attn = jnp.einsum("bnl,bnld->bnd",
                                  probs.astype(ein_dtype),
                                  v_pref.astype(ein_dtype),
                                  preferred_element_type=jnp.float32)
                # dim-major flatten — must match CausalAttention/__call__'s
                # reference-exact (head_dim, heads) interleave
                attn = (attn.transpose(0, 2, 1).reshape(batch_size, pd)
                        @ wo[l] + bo[l])

                blk_out = (jnp.concatenate([x, attn], axis=-1) @ woc[l]
                           + boc[l])
                return (h + blk_out + x, c1_cache, k_cache, v_cache,
                        ks_cache, vs_cache)

            h, c1_cache, k_cache, v_cache, ks_cache, vs_cache = (
                jax.lax.fori_loop(0, nb_blocks, block_body,
                                  (h, c1_cache, k_cache, v_cache,
                                   ks_cache, vs_cache)))

            hh = nn.relu(nn.relu(h) @ wo1 + bo1)
            logits = (hh @ wo2 + bo2) / temperature               # (B, K)
            if return_logits:
                logits_buf = jax.lax.dynamic_update_slice(
                    logits_buf, logits.reshape(batch_size, 1, 1, K),
                    (0, i, j, 0))
            if forced is not None:
                code = jax.lax.dynamic_slice(
                    forced, (0, i, j), (batch_size, 1, 1)
                ).reshape(batch_size).astype(jnp.int32)
            else:
                sub = jax.random.fold_in(rng, idx)
                code = jax.random.categorical(sub, logits,
                                              axis=-1).astype(jnp.int32)
            samples = jax.lax.dynamic_update_slice(
                samples, code.reshape(batch_size, 1, 1), (0, i, j))
            emb = jnp.take(emb_table, code, axis=0)
            in_cache = jax.lax.dynamic_update_slice(
                in_cache,
                emb.reshape(batch_size, 1, 1, model.embedding_dim).astype(
                    jnp.float32),
                (0, i + pad_in, j + pad_in, 0))
            return (samples, in_cache, c1_cache, k_cache, v_cache,
                    ks_cache, vs_cache, logits_buf)

        return body

    carry = (samples0, in_cache0, c1_cache0, k_cache0, v_cache0,
             ks_cache0, vs_cache0, logits0)
    # Segment floor of 32 pixels: tiny grids gain nothing from shorter KV
    # prefixes but would pay SNAIL_KV_SEGMENTS compiled loop bodies.
    n_seg = max(1, min(SNAIL_KV_SEGMENTS, L // 32))
    chunk = max(1, -(-L // n_seg))
    for lo in range(0, L, chunk):
        hi = min(lo + chunk, L)
        carry = jax.lax.fori_loop(lo, hi, make_body(hi), carry)
    if return_logits:
        return carry[0], carry[7]
    return carry[0]


def warn_long_seq_dropout(model, h: int, w: int) -> None:
    """One-time construction-site notice when a PixelSNAIL-family prior will
    train with dropout>0 on a grid whose raster length exceeds the dense
    attention threshold: the reference regularizes the attention WEIGHTS
    (pixelcnn_prior.py:126-127), while the flash path regularizes the
    attention OUTPUT — users comparing val-CE against reference runs should
    know the semantics changed (ADVICE r1)."""
    from movae_tpu.parallel.context import get_context_parallel

    L = h * w
    dropout = float(getattr(model, "dropout", 0.0) or 0.0)
    has_attention = isinstance(model, (PixelSNAIL, HierarchicalPixelSNAIL))
    if not (has_attention and dropout > 0.0):
        return
    ctx = get_context_parallel()
    cp_active = ctx is not None and ctx.size > 1
    if getattr(model, "attn_dropout_mode", "output") == "output":
        print(f"Note: attention dropout={dropout} regularizes the attention "
              "OUTPUT (flash path; quality-equivalent per the BENCH.md "
              "semantics A/B, 1.73x faster at the production shape). "
              "Use --attention_dropout weights for the reference's "
              "attention-weight semantics (pixelcnn_prior.py:126-127).")
        return
    if L > DENSE_ATTENTION_MAX_L:
        print(f"Note: attention grid {h}x{w} (L={L}) exceeds the dense "
              f"threshold ({DENSE_ATTENTION_MAX_L}); dropout={dropout} is "
              "applied to the attention output (flash-compatible), not the "
              "attention weights as in the reference (pixelcnn_prior.py:"
              "126-127).")
    elif cp_active:
        # at short L the dense weight-dropout branch would normally apply;
        # ring sequence-parallelism replaces it with output dropout, so
        # val-CE is not directly comparable to a --context_parallel 1 run
        print(f"Note: --context_parallel {ctx.size} routes attention "
              f"through the ring path; dropout={dropout} is applied to the "
              "attention output, not the attention weights as in the "
              "reference (pixelcnn_prior.py:126-127).")


def sample_prior(model, params, rng, batch_size, height, width,
                 condition=None, temperature: float = 1.0,
                 fast: bool = True,
                 cache_dtype: Any = jnp.int8) -> Array:
    """Dispatch: cached sampler for PixelCNN/PixelSNAIL, naive loop
    otherwise. ``cache_dtype`` only affects the PixelSNAIL KV cache
    (f32 for bitwise naive-equality; int8 default = quarter the HBM
    traffic on the per-pixel hot loop, see sample_fast_snail)."""
    if fast and isinstance(model, PixelSNAIL):
        return sample_fast_snail(model, params, rng, batch_size, height,
                                 width, condition, temperature,
                                 cache_dtype=cache_dtype)
    if fast and isinstance(model, PixelCNN):
        # Wavefront wins only in the dispatch-latency-bound regime
        # (measured on v5e, interleaved A/B, bs 256: 8x8 0.99x, 16x16
        # 1.16x, 32x32 1.59x, 64x64 0.79x — at 4096 px the raster step
        # is compute-bound and the ragged-front padding costs ~1.23x
        # FLOPs). Both samplers draw identical codes (fold_in keys).
        if 256 <= height * width <= 1024:
            return sample_wavefront(model, params, rng, batch_size, height,
                                    width, condition, temperature)
        return sample_fast(model, params, rng, batch_size, height, width,
                           condition, temperature)
    return sample_naive(model, params, rng, batch_size, height, width,
                        condition, temperature)


def sample_hierarchical(model, params, rng, batch_size: int,
                        top_shape: Tuple[int, int],
                        bottom_shape: Tuple[int, int],
                        temperature: float = 1.0,
                        fast: bool = True,
                        cache_dtype: Any = jnp.int8) -> Tuple[Array, Array]:
    """Sample z_top then z_bottom | z_top (pixelcnn_prior.py:410-416)."""
    rng_t, rng_b = jax.random.split(rng)
    # sampler modules come from the hierarchical module's own factories —
    # the same definitions setup() binds — so non-default sub-module
    # configs (num_layers_bottom, num_blocks_top, ...) can never drift
    # from the parameters being sampled
    top = model.make_top_module()
    z_top = sample_prior(top, params["prior_top"], rng_t, batch_size,
                         top_shape[0], top_shape[1], temperature=temperature,
                         fast=fast, cache_dtype=cache_dtype)
    cond = model.apply({"params": params}, z_top,
                       method="condition_from_top")
    bottom = model.make_bottom_module()
    z_bottom = sample_prior(bottom, params["prior_bottom"], rng_b, batch_size,
                            bottom_shape[0], bottom_shape[1], condition=cond,
                            temperature=temperature, fast=fast,
                            cache_dtype=cache_dtype)
    return z_top, z_bottom
