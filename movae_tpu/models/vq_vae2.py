"""VQ-VAE-2: two-level hierarchical vector quantization.

Rebuild of the reference VQVAE2 (/root/reference/models/vq_vae2.py:106-415,
rosinality-style): enc_b (stride 4) -> enc_t (stride 2) -> quantize_t ->
dec_t -> concat with enc_b -> quantize_b; decode = upsample(quant_t) ⊕
quant_b -> stride-4 decoder. Top/bottom commitment and embedding losses are
summed (vq_vae2.py:260-261); latent grids are input/8 (top) and input/4
(bottom) (vq_vae2.py:214-216).

Objectives: reconstruction_loss, commitment_loss, embedding_loss.
Features: encoding_top (=enc_t), encoding_bottom (=enc_b) — the MTL feature
seam sits at the two encoder outputs (vq_vae2.py:147), so the aggregated
cotangent pulls back through both encoders with one VJP.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from movae_tpu import objectives as obj_lib
from movae_tpu.models.base import LambdaWeights, MOVAEModel, resolve_activation
from movae_tpu.models.vq_vae import Codebook
from movae_tpu.ops import vq as vq_ops

Array = jax.Array


class ResBlock(nn.Module):
    """relu -> k3 conv(channel) -> relu -> k1 conv(in) residual
    (vq_vae2.py:13-28)."""

    in_channel: int
    channel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.channel, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv3")(h)
        h = nn.relu(h)
        h = nn.Conv(self.in_channel, (1, 1), dtype=self.dtype,
                    name="conv1")(h)
        return x + h


class Encoder(nn.Module):
    """Stride-4 or stride-2 conv stack + res blocks (vq_vae2.py:31-59)."""

    channel: int
    n_res_block: int
    n_res_channel: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.stride == 4:
            x = nn.relu(nn.Conv(self.channel // 2, (4, 4), strides=(2, 2),
                                padding="SAME", dtype=self.dtype,
                                name="down1")(x))
            x = nn.relu(nn.Conv(self.channel, (4, 4), strides=(2, 2),
                                padding="SAME", dtype=self.dtype,
                                name="down2")(x))
            x = nn.Conv(self.channel, (3, 3), padding="SAME",
                        dtype=self.dtype, name="mid")(x)
        elif self.stride == 2:
            x = nn.relu(nn.Conv(self.channel // 2, (4, 4), strides=(2, 2),
                                padding="SAME", dtype=self.dtype,
                                name="down1")(x))
            x = nn.Conv(self.channel, (3, 3), padding="SAME",
                        dtype=self.dtype, name="mid")(x)
        else:
            raise ValueError(f"stride {self.stride} not supported")
        for i in range(self.n_res_block):
            x = ResBlock(self.channel, self.n_res_channel, dtype=self.dtype,
                         name=f"res_{i}")(x)
        return nn.relu(x)


class Decoder(nn.Module):
    """k3 conv -> res blocks -> ConvTranspose upsample(s)
    (vq_vae2.py:62-103)."""

    out_channel: int
    channel: int
    n_res_block: int
    n_res_channel: int
    stride: int
    output_activation: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channel, (3, 3), padding="SAME", dtype=self.dtype,
                    name="in")(x)
        for i in range(self.n_res_block):
            x = ResBlock(self.channel, self.n_res_channel, dtype=self.dtype,
                         name=f"res_{i}")(x)
        x = nn.relu(x)
        if self.stride == 4:
            x = nn.relu(nn.ConvTranspose(self.channel // 2, (4, 4),
                                         strides=(2, 2), padding="SAME",
                                         dtype=self.dtype, name="up1")(x))
            x = nn.ConvTranspose(self.out_channel, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 name="up2")(x)
        elif self.stride == 2:
            x = nn.ConvTranspose(self.out_channel, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=self.dtype,
                                 name="up1")(x)
        return resolve_activation(self.output_activation)(x)


class VQVAE2(MOVAEModel):
    in_channels: int = 3
    embedding_dim: int = 64
    num_embeddings: int = 512
    hidden_dims: Tuple[int, ...] = (128, 256)
    num_residual_layers: int = 2
    input_size: int = 64
    recons_activation: str = "tanh"
    recons_objective: str = "mse"
    # reference default is ALL ones for VQ-VAE2 (vq_vae2.py:152), unlike
    # VQVAE's commitment 0.25 (vq_vae.py default)
    lambda_weights: LambdaWeights = (
        ("reconstruction_loss", 1.0),
        ("commitment_loss", 1.0),
        ("embedding_loss", 1.0),
    )
    dtype: Any = jnp.float32
    use_pallas_vq: Optional[bool] = None
    perceptual_fn: Optional[Any] = None
    vq_ema: bool = False
    vq_ema_decay: float = 0.99

    feature_names = ("encoding_top", "encoding_bottom")

    @property
    def objective_names(self) -> Tuple[str, ...]:
        if self.vq_ema:
            # both codebooks are EMA-maintained; the summed embedding loss
            # has no gradient path and is dropped from the objective vector
            return ("reconstruction_loss", "commitment_loss")
        return ("reconstruction_loss", "commitment_loss", "embedding_loss")

    @property
    def latent_spatial_dim_bottom(self) -> int:
        return self.input_size // 4

    @property
    def latent_spatial_dim_top(self) -> int:
        return self.input_size // 8

    def setup(self):
        ch = self.hidden_dims[0]
        nr = self.num_residual_layers
        self.enc_b = Encoder(ch, nr, 32, stride=4, dtype=self.dtype,
                             name="enc_b")
        self.enc_t = Encoder(ch, nr, 32, stride=2, dtype=self.dtype,
                             name="enc_t")
        self.quantize_conv_t = nn.Conv(self.embedding_dim, (1, 1),
                                       dtype=self.dtype,
                                       name="quantize_conv_t")
        self.vq_top = Codebook(self.num_embeddings, self.embedding_dim,
                               ema=self.vq_ema, ema_decay=self.vq_ema_decay,
                               name="vq_top")
        self.dec_t = Decoder(self.embedding_dim, ch, nr, 32, stride=2,
                             dtype=self.dtype, name="dec_t")
        self.quantize_conv_b = nn.Conv(self.embedding_dim, (1, 1),
                                       dtype=self.dtype,
                                       name="quantize_conv_b")
        self.vq_bottom = Codebook(self.num_embeddings, self.embedding_dim,
                                  ema=self.vq_ema,
                                  ema_decay=self.vq_ema_decay,
                                  name="vq_bottom")
        self.upsample_t = nn.ConvTranspose(self.embedding_dim, (4, 4),
                                           strides=(2, 2), padding="SAME",
                                           dtype=self.dtype,
                                           name="upsample_t")
        self.dec = Decoder(self.in_channels, ch, nr, 32, stride=4,
                           output_activation=self.recons_activation,
                           dtype=self.dtype, name="dec")

    # --- trunk / heads -------------------------------------------------------
    def trunk(self, x: Array, train: bool = False):
        enc_b = self.enc_b(x.astype(self.dtype)).astype(jnp.float32)
        enc_t = self.enc_t(enc_b.astype(self.dtype)).astype(jnp.float32)
        return (enc_t, enc_b), None

    def heads(self, features, aux, x: Array, train: bool = False
              ) -> Dict[str, Any]:
        enc_t, enc_b = features
        qt_in = self.quantize_conv_t(enc_t.astype(self.dtype)).astype(
            jnp.float32)
        vq_t = vq_ops.vector_quantize(qt_in, self.vq_top(),
                                      use_pallas=self.use_pallas_vq)
        if self.vq_ema and train:
            self.vq_top.apply_ema(qt_in.reshape(-1, self.embedding_dim),
                                  vq_t["encoding_inds"])
        dec_t = self.dec_t(vq_t["quantized"])
        qb_in = self.quantize_conv_b(
            jnp.concatenate([dec_t.astype(self.dtype),
                             enc_b.astype(self.dtype)], axis=-1)).astype(
            jnp.float32)
        vq_b = vq_ops.vector_quantize(qb_in, self.vq_bottom(),
                                      use_pallas=self.use_pallas_vq)
        if self.vq_ema and train:
            self.vq_bottom.apply_ema(qb_in.reshape(-1, self.embedding_dim),
                                     vq_b["encoding_inds"])
        recons = self.decode(vq_t["quantized"], vq_b["quantized"],
                             train=train)
        return {
            "recons": recons,
            "encoding_top": enc_t,
            "encoding_bottom": enc_b,
            "quantized_top": vq_t["quantized"],
            "quantized_bottom": vq_b["quantized"],
            "commitment_loss": vq_t["commitment"] + vq_b["commitment"],
            "embedding_loss": vq_t["embedding"] + vq_b["embedding"],
            "encoding_inds_top": vq_t["encoding_inds"],
            "encoding_inds_bottom": vq_b["encoding_inds"],
        }

    def decode(self, quant_t: Array, quant_b: Array,
               train: bool = False) -> Array:
        dec_t = self.upsample_t(quant_t.astype(self.dtype))
        return self.dec(jnp.concatenate(
            [dec_t, quant_b.astype(self.dtype)], axis=-1)).astype(jnp.float32)

    # --- losses ---------------------------------------------------------------
    def _recon_fn(self):
        if self.recons_objective.lower() == "perceptual":
            return self.perceptual_fn
        fn, _ = obj_lib.get_recon_obj_and_activation(
            self.recons_objective, self.recons_activation)
        return fn

    def loss_terms(self, x: Array, outputs: Dict[str, Any]) -> Dict[str, Array]:
        lw = dict(self.lambda_weights)
        out = {}
        for key in self.objective_names:
            if key == "reconstruction_loss":
                v = self._recon_fn()(x, outputs["recons"])
            elif key in ("commitment_loss", "embedding_loss"):
                v = outputs[key]
            else:
                v = self._extra_loss(key, x, outputs)
            out[key] = lw[key] * v
        return out

    def _extra_loss(self, key, x, outputs):  # hook for GG variant
        raise KeyError(key)

    # --- code extraction & generation ----------------------------------------
    def get_code_indices_pair(self, x: Array) -> Tuple[Array, Array]:
        """(top, bottom) code grids for prior training. Runs only the
        encoder path (enc_b/enc_t, both quantizers, and dec_t — which the
        bottom quantizer conditions on) and skips the full stride-4 image
        decoder, roughly halving the extraction-sweep FLOPs."""
        (enc_t, enc_b), _ = self.trunk(x, train=False)
        qt_in = self.quantize_conv_t(enc_t.astype(self.dtype)).astype(
            jnp.float32)
        vq_t = vq_ops.vector_quantize(qt_in, self.vq_top(),
                                      use_pallas=self.use_pallas_vq)
        dec_t = self.dec_t(vq_t["quantized"])
        qb_in = self.quantize_conv_b(
            jnp.concatenate([dec_t.astype(self.dtype),
                             enc_b.astype(self.dtype)], axis=-1)).astype(
            jnp.float32)
        vq_b = vq_ops.vector_quantize(qb_in, self.vq_bottom(),
                                      use_pallas=self.use_pallas_vq)
        b = x.shape[0]
        st, sb = self.latent_spatial_dim_top, self.latent_spatial_dim_bottom
        return (vq_t["encoding_inds"].reshape(b, st, st),
                vq_b["encoding_inds"].reshape(b, sb, sb))

    def decode_code(self, code_t: Array, code_b: Array) -> Array:
        quant_t = self.vq_top.embed_code(code_t)
        quant_b = self.vq_bottom.embed_code(code_b)
        return self.decode(quant_t, quant_b, train=False)

    def sample(self, num_samples: int) -> Array:
        """Uniform-random codes for both levels (naive; use a hierarchical
        prior for quality sampling)."""
        st, sb = self.latent_spatial_dim_top, self.latent_spatial_dim_bottom
        k1, k2 = jax.random.split(self.make_rng("sample"))
        ct = jax.random.randint(k1, (num_samples, st, st), 0,
                                self.num_embeddings)
        cb = jax.random.randint(k2, (num_samples, sb, sb), 0,
                                self.num_embeddings)
        return self.decode_code(ct, cb)
