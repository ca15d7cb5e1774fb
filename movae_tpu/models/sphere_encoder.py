"""Sphere Encoder: image generation with a spherical latent space.

Rebuild of the reference SphereEncoder
(/root/reference/models/sphere_encoder.py:75-308, after arXiv:2602.15030):
the VAE conv backbone with the mu/log_var heads replaced by a single linear
projection + spherify (RMS-normalize to radius sqrt(L)); training draws a
noise angle alpha ~ U[0, alpha_max] (sigma = tan(alpha)), a sub-noise scale
s ~ U[0, 0.5] sharing the same direction e, and optimizes three objectives:

  pix_recon — smooth-L1 (+ VGG perceptual) reconstruction of the small-noise
              decode vs x (sphere_encoder.py:249-262);
  pix_con   — big-noise decode vs stop-grad(small-noise decode) (263-268);
  lat_con   — 1 - cosine(v, enc(dec(v_noisy))) (269-271).

``feature_names = None`` (sphere_encoder.py:138). Sampling decodes a random
sphere point in one step or iterates encode/decode with shared noise
(sphere_encoder.py:285-308).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from movae_tpu.models.base import LambdaWeights
from movae_tpu.models.vae import VAE
from movae_tpu.objectives import smooth_l1_per_pixel_mean

Array = jax.Array


def rms_norm(x: Array, eps: float = 1e-6) -> Array:
    rms = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)
    return x / rms


def spherify(x: Array, radius: Optional[float] = None) -> Array:
    if radius is None:
        radius = math.sqrt(x.shape[-1])
    return rms_norm(x) * radius


class SphereEncoder(VAE):
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
    lambda_weights: LambdaWeights = (("pix_recon", 1.0), ("pix_con", 0.5),
                                     ("lat_con", 0.1))

    objective_names = ("pix_recon", "pix_con", "lat_con")
    feature_names = None

    @property
    def radius(self) -> float:
        return math.sqrt(self.latent_dim)

    @property
    def sigma_max(self) -> float:
        return math.tan(math.radians(self.sigma_max_angle_deg))

    def setup(self):
        hd = tuple(self.hidden_dims)
        self.enc_convs = [
            nn.Conv(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name=f"enc_conv_{i}")
            for i, h in enumerate(hd)
        ]
        self.enc_norms = self._make_norms(len(hd), "enc_norm")
        self.encoder_proj = nn.Dense(self.latent_dim, dtype=self.dtype,
                                     name="encoder_proj")
        self.decoder_input = nn.Dense(self.encoder_output_size,
                                      dtype=self.dtype, name="decoder_input")
        rev = tuple(reversed(hd))
        self.dec_deconvs = [
            nn.ConvTranspose(rev[i + 1], (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)), dtype=self.dtype,
                             name=f"dec_deconv_{i}")
            for i in range(len(rev) - 1)
        ]
        self.dec_norms = self._make_norms(len(rev) - 1, "dec_norm")
        self.final_deconv = nn.ConvTranspose(rev[-1], (3, 3), strides=(2, 2),
                                             padding=((1, 2), (1, 2)),
                                             dtype=self.dtype,
                                             name="final_deconv")
        self.final_norms = self._make_norms(1, "final_norm")
        self.final_conv = nn.Conv(self.in_channels, (3, 3), padding="SAME",
                                  dtype=self.dtype, name="final_conv")

    # --- encoder / decoder --------------------------------------------------
    def encode_to_vector(self, x: Array, train: bool = False) -> Array:
        h = x.astype(self.dtype)
        for conv, norm in zip(self.enc_convs, self.enc_norms):
            h = conv(h)
            h = self._apply_norm(norm, h, train)
            h = nn.leaky_relu(h, negative_slope=0.01)
        h = h.reshape((h.shape[0], -1))
        return self.encoder_proj(h).astype(jnp.float32)

    def _spherify_noisy(self, z: Array, sigma: Optional[Array] = None,
                        e: Optional[Array] = None) -> Array:
        """spherify(spherify(z) + sigma*e) — noise is added to the already
        spherified v per the paper (sphere_encoder.py:146-162)."""
        v = spherify(z, self.radius)
        if sigma is not None and e is not None:
            v = spherify(v + sigma * e, self.radius)
        return v

    def decode_from_sphere(self, v: Array, train: bool = False) -> Array:
        return super().decode(v, train=train)

    def decode(self, z: Array, train: bool = False) -> Array:
        return self.decode_from_sphere(self._spherify_noisy(z), train=train)

    def encode(self, x: Array, train: bool = False):
        z = self.encode_to_vector(x, train=train)
        return (self._spherify_noisy(z),)

    def trunk(self, x: Array, train: bool = True):
        # feature_names=None keeps the MOO engine on the full-parameter
        # path (reference sphere_encoder.py:138); the inherited VAE.trunk
        # would unpack encode()'s 1-tuple as (mu, log_var) — fail loudly
        # instead of propagating garbage if anyone routes here.
        raise NotImplementedError(
            "SphereEncoder has no trunk/heads split (feature_names=None); "
            "use forward_with_losses / the full-parameter Jacobian path")

    def heads_with_losses(self, features, trunk_aux, x, train: bool = True):
        raise NotImplementedError(
            "SphereEncoder has no trunk/heads split (feature_names=None)")

    # --- forward (training noise schedule) -----------------------------------
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

        e = jax.random.normal(self.make_rng("sample"), (b, self.latent_dim),
                              jnp.float32)
        v_noisy = self._spherify_noisy(z, sigma, e)
        v_noisy_small = self._spherify_noisy(z, sigma_sub, e)

        x_recon_small = self.decode_from_sphere(v_noisy_small, train=train)
        x_recon_noisy = self.decode_from_sphere(v_noisy, train=train)
        x_recon_small_sg = jax.lax.stop_gradient(x_recon_small)

        z_enc_dec = self.encode_to_vector(x_recon_noisy, train=train)
        v_enc_dec = self._spherify_noisy(z_enc_dec)

        return {
            "recons": x_recon_small,
            "v": v,
            "v_noisy": v_noisy,
            "v_noisy_small": v_noisy_small,
            "x_recon_NOISY": x_recon_noisy,
            "x_recon_noisy_small_sg": x_recon_small_sg,
            "v_enc_dec": v_enc_dec,
            "sigma": sigma,
            "sigma_sub": sigma_sub,
            # diagnostic extras beyond the reference's dict (harmless —
            # loss_terms reads by name): the raw draws, so equivalence
            # studies can replay them into the reference's torch.rand/randn
            # call sites (scripts/equivalence_study.py SPHERE_ARCHS)
            "angle_deg": angle_deg,
            "s": s,
            "e": e,
        }

    # --- losses ---------------------------------------------------------------
    def _pixel_loss(self, pred: Array, target: Array, sl1_w: float,
                    perc_w: float) -> Array:
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
        lat_con = jnp.mean(1.0 - cos)
        return {
            "pix_recon": self.lambda_pix_recon * pix_recon,
            "pix_con": self.lambda_pix_con * pix_con,
            "lat_con": self.lambda_lat_con * lat_con,
        }

    # --- generation -------------------------------------------------------------
    def sample(self, num_samples: int, steps: int = 1,
               share_noise: bool = True) -> Array:
        e = jax.random.normal(self.make_rng("sample"),
                              (num_samples, self.latent_dim), jnp.float32)
        v = spherify(e, self.radius)
        x = self.decode_from_sphere(v, train=False)
        for i in range(steps - 1):
            z = self.encode_to_vector(x, train=False)
            e_step = e if share_noise else jax.random.normal(
                self.make_rng("sample"), e.shape, jnp.float32)
            v = self._spherify_noisy(z, self.sigma_max, e_step)
            x = self.decode_from_sphere(v, train=False)
        return x
