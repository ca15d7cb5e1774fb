"""Sphere Encoder ViT: the paper architecture (ViT + MLP-Mixer + RoPE +
sinusoidal positions).

Rebuild of /root/reference/models/sphere_encoder_vit.py:34-497
(arXiv:2602.15030 §2.4): PatchEmbed -> sinusoidal absolute positions ->
pre-norm Transformer (depth 24, dim 1024 default) with RoPE on Q/K ->
MLP-Mixer (token + channel mixing, RMSNorm) at the encoder tail / decoder
head -> per-patch latent channels -> spherify; decoder mirrors back through
Unpatchify + tanh. Same three-objective training and one/few-step sampling
as :class:`movae_tpu.models.sphere_encoder.SphereEncoder`.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from movae_tpu.models.base import LambdaWeights, MOVAEModel
from movae_tpu.models.sphere_encoder import rms_norm, spherify
from movae_tpu.objectives import smooth_l1_per_pixel_mean

Array = jax.Array


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        return rms_norm(x, self.eps) * w


def sinusoidal_table(n: int, dim: int) -> np.ndarray:
    pe = np.zeros((n, dim), np.float32)
    pos = np.arange(n, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32)
                 * (-math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe


def rope_freqs(n: int, head_dim: int, base: float = 10000.0) -> np.ndarray:
    inv = 1.0 / (base ** (np.arange(0, head_dim, 2, np.float32) / head_dim))
    return np.outer(np.arange(n, dtype=np.float32), inv)  # (N, head_dim/2)


def apply_rope(q: Array, k: Array, freqs: Array):
    """q,k: (B, H, N, hd); freqs: (N, hd/2). Interleaved-pair rotation
    (sphere_encoder_vit.py:71-89)."""
    cos = jnp.cos(freqs)[None, None]  # (1,1,N,hd/2)
    sin = jnp.sin(freqs)[None, None]

    def rot(u):
        u1, u2 = u[..., 0::2], u[..., 1::2]
        r0 = u1 * cos - u2 * sin
        r1 = u1 * sin + u2 * cos
        return jnp.stack([r0, r1], axis=-1).reshape(u.shape)

    return rot(q), rot(k)


class AttentionRoPE(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freqs, train: bool = False):
        b, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q, k = apply_rope(q, k, freqs.astype(q.dtype))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (hd ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=not train)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class TransformerBlock(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, freqs, train: bool = False):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + AttentionRoPE(self.embed_dim, self.num_heads, self.dropout,
                              dtype=self.dtype, name="attn")(h, freqs, train)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(self.embed_dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp1")(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="mlp2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return x + h


class MLPMixerBlock(nn.Module):
    num_patches: int
    embed_dim: int
    tokens_mlp_dim: int = 256
    channels_mlp_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = RMSNorm(self.embed_dim, name="norm1")(x).transpose(0, 2, 1)
        h = nn.Dense(self.tokens_mlp_dim, dtype=self.dtype, name="tok1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.num_patches, dtype=self.dtype, name="tok2")(h)
        x = x + h.transpose(0, 2, 1)
        h = RMSNorm(self.embed_dim, name="norm2")(x)
        h = nn.Dense(self.channels_mlp_dim, dtype=self.dtype, name="ch1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="ch2")(h)
        return x + h


class MLPMixer(nn.Module):
    num_patches: int
    embed_dim: int
    depth: int
    tokens_mlp_dim: int = 256
    channels_mlp_dim: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = MLPMixerBlock(self.num_patches, self.embed_dim,
                              self.tokens_mlp_dim, self.channels_mlp_dim,
                              dtype=self.dtype, name=f"block_{i}")(x)
        return RMSNorm(self.embed_dim, name="norm")(x)


class SphereEncoderViT(MOVAEModel):
    img_size: int = 32
    patch_size: int = 2
    in_channels: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    mixer_depth: int = 2
    mixer_tokens_mlp_dim: int = 256
    mixer_channels_mlp_dim: int = 2048
    latent_channels: int = 8
    num_classes: int = 0
    sigma_max_angle_deg: float = 80.0
    sigma_mix_prob: float = 0.0
    sigma_mix_angle_min_deg: Optional[float] = None
    sigma_mix_angle_max_deg: Optional[float] = None
    lambda_pix_recon: float = 1.0
    lambda_pix_con: float = 0.5
    lambda_lat_con: float = 0.1
    pix_recon_smooth_l1_weight: float = 1.0
    pix_recon_perceptual_weight: float = 1.0
    pix_con_smooth_l1_weight: float = 0.5
    pix_con_perceptual_weight: float = 0.5
    use_perceptual: bool = True
    dropout: float = 0.0
    lambda_weights: LambdaWeights = (("pix_recon", 1.0), ("pix_con", 0.5),
                                     ("lat_con", 0.1))
    dtype: Any = jnp.float32
    perceptual_fn: Optional[Any] = None

    objective_names = ("pix_recon", "pix_con", "lat_con")
    feature_names = None

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def L(self) -> int:
        return self.num_patches * self.latent_channels

    @property
    def latent_dim(self) -> int:  # for API parity with SphereEncoder
        return self.L

    @property
    def input_size(self) -> int:
        return self.img_size

    @property
    def radius(self) -> float:
        return math.sqrt(self.L)

    @property
    def sigma_max(self) -> float:
        return math.tan(math.radians(self.sigma_max_angle_deg))

    def setup(self):
        p, d = self.patch_size, self.embed_dim
        self.patch_embed_enc = nn.Conv(d, (p, p), strides=(p, p),
                                       padding="VALID", dtype=self.dtype,
                                       name="patch_embed_enc")
        self.blocks_enc = [
            TransformerBlock(d, self.num_heads, self.mlp_ratio, self.dropout,
                             dtype=self.dtype, name=f"enc_block_{i}")
            for i in range(self.depth)
        ]
        self.mixer_enc = MLPMixer(self.num_patches, d, self.mixer_depth,
                                  self.mixer_tokens_mlp_dim,
                                  self.mixer_channels_mlp_dim,
                                  dtype=self.dtype, name="mixer_enc")
        self.norm_enc = RMSNorm(d, name="norm_enc")
        self.latent_proj_enc = nn.Dense(self.latent_channels,
                                        dtype=self.dtype,
                                        name="latent_proj_enc")
        self.latent_proj_dec = nn.Dense(d, dtype=self.dtype,
                                        name="latent_proj_dec")
        self.norm_dec_in = RMSNorm(d, name="norm_dec_in")
        self.mixer_dec = MLPMixer(self.num_patches, d, self.mixer_depth,
                                  self.mixer_tokens_mlp_dim,
                                  self.mixer_channels_mlp_dim,
                                  dtype=self.dtype, name="mixer_dec")
        self.blocks_dec = [
            TransformerBlock(d, self.num_heads, self.mlp_ratio, self.dropout,
                             dtype=self.dtype, name=f"dec_block_{i}")
            for i in range(self.depth)
        ]
        self.norm_dec_out = nn.LayerNorm(dtype=self.dtype,
                                         name="norm_dec_out")
        self.head_dec = nn.Dense(p * p * self.in_channels, dtype=self.dtype,
                                 name="head_dec")

    def _freqs(self):
        hd = self.embed_dim // self.num_heads
        return jnp.asarray(rope_freqs(self.num_patches, hd))

    def _pos(self):
        return jnp.asarray(sinusoidal_table(self.num_patches, self.embed_dim))

    # --- encode / decode ------------------------------------------------------
    def encode_to_vector(self, x: Array, train: bool = False) -> Array:
        b = x.shape[0]
        h = self.patch_embed_enc(x.astype(self.dtype))
        h = h.reshape(b, -1, self.embed_dim)  # (B, N, D)
        h = h + self._pos().astype(h.dtype)
        freqs = self._freqs()
        for blk in self.blocks_enc:
            h = blk(h, freqs, train=train)
        h = self.mixer_enc(h)
        h = self.norm_enc(h)
        z = self.latent_proj_enc(h)
        return z.reshape(b, -1).astype(jnp.float32)

    def _spherify_noisy(self, z, sigma=None, e=None):
        v = spherify(z, self.radius)
        if sigma is not None and e is not None:
            v = spherify(v + sigma * e, self.radius)
        return v

    def decode_from_sphere(self, v: Array, train: bool = False) -> Array:
        b = v.shape[0]
        h = v.reshape(b, self.num_patches, self.latent_channels).astype(
            self.dtype)
        h = self.latent_proj_dec(h)
        h = self.norm_dec_in(h)
        h = self.mixer_dec(h)
        h = h + self._pos().astype(h.dtype)
        freqs = self._freqs()
        for blk in self.blocks_dec:
            h = blk(h, freqs, train=train)
        h = self.norm_dec_out(h)
        h = self.head_dec(h)  # (B, N, P*P*C)
        g = self.img_size // self.patch_size
        p, c = self.patch_size, self.in_channels
        h = h.reshape(b, g, g, p, p, c)
        img = h.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, self.img_size, self.img_size, c)
        return jnp.tanh(img).astype(jnp.float32)

    def decode(self, z: Array, train: bool = False) -> Array:
        return self.decode_from_sphere(self._spherify_noisy(z), train=train)

    # --- forward / losses (identical schedule to SphereEncoder) --------------
    def __call__(self, x: Array, train: bool = False) -> Dict[str, Any]:
        b = x.shape[0]
        z = self.encode_to_vector(x, train=train)
        v = self._spherify_noisy(z)

        k1, k2, k3, k4 = jax.random.split(self.make_rng("sample"), 4)
        angle_deg = jax.random.uniform(k1, (b, 1)) * self.sigma_max_angle_deg
        if (self.sigma_mix_prob > 0
                and self.sigma_mix_angle_min_deg is not None
                and self.sigma_mix_angle_max_deg is not None
                and self.sigma_mix_angle_max_deg > self.sigma_mix_angle_min_deg):
            mix_mask = jax.random.uniform(k2, (b, 1)) < self.sigma_mix_prob
            mix_angle = (self.sigma_mix_angle_min_deg
                         + jax.random.uniform(k3, (b, 1))
                         * (self.sigma_mix_angle_max_deg
                            - self.sigma_mix_angle_min_deg))
            angle_deg = jnp.where(mix_mask, mix_angle, angle_deg)
        sigma = jnp.tan(angle_deg * (math.pi / 180.0))
        s = jax.random.uniform(k4, (b, 1)) * 0.5
        sigma_sub = s * sigma

        e = jax.random.normal(self.make_rng("sample"), (b, self.L),
                              jnp.float32)
        v_noisy = self._spherify_noisy(z, sigma, e)
        v_noisy_small = self._spherify_noisy(z, sigma_sub, e)

        x_small = self.decode_from_sphere(v_noisy_small, train=train)
        x_noisy = self.decode_from_sphere(v_noisy, train=train)
        z_ed = self.encode_to_vector(x_noisy, train=train)
        v_ed = self._spherify_noisy(z_ed)
        return {
            "recons": x_small, "v": v, "v_noisy": v_noisy,
            "v_noisy_small": v_noisy_small, "x_recon_NOISY": x_noisy,
            "x_recon_noisy_small_sg": jax.lax.stop_gradient(x_small),
            "v_enc_dec": v_ed, "sigma": sigma, "sigma_sub": sigma_sub,
            # diagnostic extras (see sphere_encoder.py __call__): raw draws
            # for cross-framework replay in equivalence studies
            "angle_deg": angle_deg, "s": s, "e": e,
        }

    def _pixel_loss(self, pred, target, sl1_w, perc_w):
        loss = sl1_w * smooth_l1_per_pixel_mean(target, pred)
        if self.use_perceptual and self.perceptual_fn is not None and perc_w > 0:
            loss = loss + perc_w * self.perceptual_fn(target, pred)
        return loss

    def loss_terms(self, x: Array, outputs: Dict[str, Any]) -> Dict[str, Array]:
        pix_recon = self._pixel_loss(outputs["recons"], x,
                                     self.pix_recon_smooth_l1_weight,
                                     self.pix_recon_perceptual_weight)
        pix_con = self._pixel_loss(outputs["x_recon_NOISY"],
                                   outputs["x_recon_noisy_small_sg"],
                                   self.pix_con_smooth_l1_weight,
                                   self.pix_con_perceptual_weight)
        v, v_ed = outputs["v"], outputs["v_enc_dec"]
        cos = jnp.sum(v * v_ed, axis=-1) / (
            jnp.linalg.norm(v, axis=-1) * jnp.linalg.norm(v_ed, axis=-1)
            + 1e-12)
        return {
            "pix_recon": self.lambda_pix_recon * pix_recon,
            "pix_con": self.lambda_pix_con * pix_con,
            "lat_con": self.lambda_lat_con * jnp.mean(1.0 - cos),
        }

    def sample(self, num_samples: int, steps: int = 1,
               share_noise: bool = True) -> Array:
        e = jax.random.normal(self.make_rng("sample"),
                              (num_samples, self.L), jnp.float32)
        v = spherify(e, self.radius)
        x = self.decode_from_sphere(v, train=False)
        for _ in range(steps - 1):
            z = self.encode_to_vector(x, train=False)
            e_step = e if share_noise else jax.random.normal(
                self.make_rng("sample"), e.shape, jnp.float32)
            v = self._spherify_noisy(z, self.sigma_max, e_step)
            x = self.decode_from_sphere(v, train=False)
        return x
