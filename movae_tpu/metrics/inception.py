"""InceptionV3 in Flax (pool-2048 features + 1000-way logits).

Architecture-exact rebuild of torchvision's ``inception_v3``
(``transform_input=False``) used by the reference metric towers
(/root/reference/utils/metrics.py:360-510): BasicConv2d = bias-free conv +
BatchNorm(eps=1e-3) + ReLU; Mixed_5b..7c Inception blocks; global average
pool to 2048 features; optional fc head for the Inception Score.

Pretrained weights: this environment cannot download torchvision weights.
``load_params`` accepts a converted ``.npz`` (see ``convert_torch_weights``)
via the ``MOVAE_INCEPTION_WEIGHTS`` env var or an explicit path; otherwise a
fixed-seed random initialization is used and a warning is printed — the
metric remains a valid *relative* measure (random-feature FID), but absolute
values are not comparable to the standard FID. Drop a weights file in to get
standard numbers; no code changes needed.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


class BasicConv2d(nn.Module):
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "VALID"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel_size, strides=self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _avg_pool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _max_pool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)),
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns (features_2048, logits_1000)."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)),
                        name="Conv2d_2b_3x3")(x)
        x = _max_pool3s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        feats = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)
        logits = nn.Dense(self.num_classes, name="fc")(feats)
        return feats, logits


_WARNED = False


def load_params(path: Optional[str] = None) -> Any:
    """Load converted weights (.npz of flat 'a/b/c' -> array) or fall back to
    a fixed-seed random init (prints a one-time warning)."""
    global _WARNED
    path = path or os.environ.get("MOVAE_INCEPTION_WEIGHTS")
    model = InceptionV3()
    variables = model.init(jax.random.PRNGKey(20260816),
                           jnp.zeros((1, 299, 299, 3), jnp.float32))
    if path:
        if not os.path.exists(path):
            # a set-but-wrong path must be an error, not a silent fall back
            # to random features (all FID/IS/KID would be quietly
            # meaningless while the user believes weights are loaded)
            raise FileNotFoundError(
                f"MOVAE_INCEPTION_WEIGHTS points at a missing file: {path}")
        from movae_tpu.metrics.pretrained import merge_pretrained
        return merge_pretrained(variables, dict(np.load(path)),
                                f"InceptionV3 weights {path}")
    if not _WARNED:
        print("WARNING: no pretrained InceptionV3 weights found "
              "(set MOVAE_INCEPTION_WEIGHTS); using fixed random features — "
              "FID/IS/KID are relative-only.")
        _WARNED = True
    return variables


def convert_torch_weights(torch_state_dict, out_path: str):
    """Convert a torchvision inception_v3 state_dict into the .npz layout
    expected by :func:`load_params` (run wherever torchvision is available)."""
    out = {}
    for k, v in torch_state_dict.items():
        v = np.asarray(v)
        parts = k.split(".")
        # torchvision: Mixed_5b.branch1x1.conv.weight etc.
        if parts[-2] == "conv" and parts[-1] == "weight":
            # OIHW -> HWIO
            arr = v.transpose(2, 3, 1, 0)
            key = "params/" + "/".join(parts[:-1]) + "/kernel"
        elif parts[-2] == "bn":
            name = {"weight": "scale", "bias": "bias"}.get(parts[-1])
            if name:
                key = "params/" + "/".join(parts[:-1]) + f"/{name}"
                arr = v
            elif parts[-1] == "running_mean":
                key = "batch_stats/" + "/".join(parts[:-1]) + "/mean"
                arr = v
            elif parts[-1] == "running_var":
                key = "batch_stats/" + "/".join(parts[:-1]) + "/var"
                arr = v
            else:
                continue
        elif parts[0] == "fc":
            arr = v.T if parts[-1] == "weight" else v
            key = f"params/fc/{'kernel' if parts[-1] == 'weight' else 'bias'}"
        else:
            continue
        out[key] = arr
    np.savez(out_path, **out)
    return out_path
