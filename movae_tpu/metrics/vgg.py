"""VGG16 feature tower in Flax — LPIPS + perceptual loss backbone.

Rebuild of the reference's torchvision-VGG16-based extractors
(/root/reference/utils/metrics.py:206-357, utils/objectives.py:53-79):
features are tapped after the ReLUs of conv1_2 / conv2_2 / conv3_3 / conv4_3
(torch feature indices 3, 8, 15, 22). LPIPS = mean over layers of the
spatially-averaged squared distance between channel-unit-normalized features;
the perceptual recon loss is the plain feature MSE at conv3_3.

Weights: converted .npz via ``MOVAE_VGG16_WEIGHTS`` or fixed-seed random
fallback (relative-only metric; see inception.py note).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

# VGG16 cfg "D" conv plan: (name, out_channels); 'M' = maxpool
_VGG_PLAN = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), "M",
]

LPIPS_TAPS = ("conv1_2", "conv2_2", "conv3_3", "conv4_3")
PERCEPTUAL_TAP = "conv3_3"

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """Forward through conv4_3, returning the tapped activations."""

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        taps = {}
        for item in _VGG_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            name, ch = item
            x = nn.relu(nn.Conv(ch, (3, 3), padding="SAME", name=name)(x))
            if name in LPIPS_TAPS:
                taps[name] = x
        return taps


def preprocess(x: Array) -> Array:
    """[-1,1]/[0,1] auto-range + ImageNet normalization (metrics.py:263-277).
    NHWC."""
    x = x.astype(jnp.float32)
    x = jnp.where(jnp.min(x) < 0, (x + 1.0) / 2.0, x)
    x = jnp.clip(x, 0.0, 1.0)
    return (x - _IMAGENET_MEAN) / _IMAGENET_STD


_WARNED = False


def load_params(path: Optional[str] = None):
    global _WARNED
    path = path or os.environ.get("MOVAE_VGG16_WEIGHTS")
    model = VGG16Features()
    variables = model.init(jax.random.PRNGKey(20260816),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    if path:
        if not os.path.exists(path):
            # set-but-wrong path = error, not a silent random-feature
            # fallback (see inception.load_params)
            raise FileNotFoundError(
                f"MOVAE_VGG16_WEIGHTS points at a missing file: {path}")
        from movae_tpu.metrics.pretrained import merge_pretrained
        return merge_pretrained(variables, dict(np.load(path)),
                                f"VGG16 weights {path}")
    if not _WARNED:
        print("WARNING: no pretrained VGG16 weights (set MOVAE_VGG16_WEIGHTS);"
              " LPIPS/perceptual use fixed random features.")
        _WARNED = True
    return variables


def convert_torch_weights(torch_state_dict, out_path: str):
    """torchvision vgg16 'features.N.weight' -> flax npz (run offline)."""
    idx_map = {}
    idx = 0
    for item in _VGG_PLAN:
        if item == "M":
            idx += 1  # maxpool
            continue
        idx_map[idx] = item[0]
        idx += 2  # conv + relu
    out = {}
    for k, v in torch_state_dict.items():
        parts = k.split(".")
        if parts[0] != "features":
            continue
        i = int(parts[1])
        if i not in idx_map:
            continue
        name = idx_map[i]
        v = np.asarray(v)
        if parts[2] == "weight":
            out[f"params/{name}/kernel"] = v.transpose(2, 3, 1, 0)
        else:
            out[f"params/{name}/bias"] = v
    np.savez(out_path, **out)
    return out_path


def lpips_from_taps(t1: Dict[str, Array], t2: Dict[str, Array]) -> Array:
    """metrics.py:331-357: unit-normalize channels, squared distance summed
    over channels, averaged over space, averaged over layers and batch."""
    scores = []
    for name in LPIPS_TAPS:
        f1, f2 = t1[name], t2[name]
        n1 = f1 / jnp.clip(jnp.linalg.norm(f1, axis=-1, keepdims=True),
                           min=1e-10)
        n2 = f2 / jnp.clip(jnp.linalg.norm(f2, axis=-1, keepdims=True),
                           min=1e-10)
        d = jnp.sum(jnp.square(n1 - n2), axis=-1)       # (B, H, W)
        scores.append(jnp.mean(d, axis=(1, 2)))         # (B,)
    return jnp.mean(jnp.stack(scores))


def make_lpips_fn(variables=None):
    """Returns a jitted (img1, img2) -> scalar LPIPS."""
    variables = variables if variables is not None else load_params()
    model = VGG16Features()

    @jax.jit
    def fn(img1: Array, img2: Array) -> Array:
        t1 = model.apply(variables, preprocess(img1))
        t2 = model.apply(variables, preprocess(img2))
        return lpips_from_taps(t1, t2)

    return fn


def make_perceptual_fn(variables=None):
    """(inputs, recons) -> feature MSE at conv3_3 (objectives.py:53-79)."""
    variables = variables if variables is not None else load_params()
    model = VGG16Features()

    def fn(inputs: Array, recons: Array) -> Array:
        t_in = model.apply(variables, preprocess(inputs))
        t_re = model.apply(variables, preprocess(recons))
        return jnp.mean(jnp.square(t_re[PERCEPTUAL_TAP] - t_in[PERCEPTUAL_TAP]))

    return fn
