"""Strict merging of converted pretrained weights into flax variables.

The reference loads torchvision's pretrained InceptionV3/VGG16 directly
(utils/metrics.py:360-510); in this build the weights arrive as converted
``.npz`` files (scripts/convert_metric_weights.py). A user who points
``MOVAE_INCEPTION_WEIGHTS``/``MOVAE_VGG16_WEIGHTS`` at a file expects the
pretrained network — a silent partial merge would quietly produce
random-feature FID/IS/LPIPS numbers, so any missing or shape-mismatched
entry is an error, not a fallback.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import traverse_util


def merge_pretrained(variables: Any, flat: Dict[str, np.ndarray],
                     source: str) -> Any:
    """Replace every leaf of ``variables`` with the same-named entry of
    ``flat`` ('a/b/c'-keyed arrays). Raises ValueError if any variable path
    is missing from ``flat`` or has a different shape (extra npz keys are
    ignored). Returns the merged variable tree."""
    var_flat = traverse_util.flatten_dict(variables, sep="/")
    missing = [k for k in var_flat if k not in flat]
    if missing:
        raise ValueError(
            f"{source}: {len(missing)}/{len(var_flat)} variable paths are "
            f"missing from the weights file (e.g. {missing[:3]}); refusing "
            "a partial merge — regenerate the file with "
            "scripts/convert_metric_weights.py.")
    bad = [(k, tuple(np.shape(flat[k])), tuple(np.shape(var_flat[k])))
           for k in var_flat if tuple(np.shape(flat[k]))
           != tuple(np.shape(var_flat[k]))]
    if bad:
        k, got, want = bad[0]
        raise ValueError(
            f"{source}: {len(bad)} entries have wrong shapes (e.g. {k}: "
            f"file {got} vs model {want}); the file was converted for a "
            "different architecture/layout.")
    merged = {k: jnp.asarray(flat[k]) for k in var_flat}
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in merged.items()})
