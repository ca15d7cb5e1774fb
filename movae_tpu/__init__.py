"""MO-VAE TPU: a TPU-native multi-objective VAE framework.

A from-scratch JAX/Flax/optax/Pallas rebuild of the capabilities of the
reference ``rkhosrowshahi/MO-VAE`` PyTorch framework (see /root/reference):
multi-objective ELBO decomposition with Jacobian-descent gradient
aggregation, a VAE/VQ-VAE model zoo, PixelCNN/PixelSNAIL priors, an
on-accelerator metrics suite (FID/IS/KID/PSNR/SSIM/LPIPS), a code cache for
prior training, and a YAML config runner CLI.

Design stance (TPU-first, not a port):
  * one jitted train step ``(state, batch, rng) -> (state, metrics)``;
  * per-objective gradients from a single vmapped VJP (not m sequential
    backward passes as in the reference, main.py:188-196);
  * aggregators are pure ``Gramian -> alpha`` functions compiled into the
    step (reference: utils/torchmoo/*, torchjd);
  * data parallelism via ``jax.sharding.Mesh`` + NamedSharding; XLA inserts
    all-reduces over ICI (the reference is single-device, main.py:155).
"""

__version__ = "0.1.0"
