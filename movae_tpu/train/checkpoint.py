"""Checkpointing: orbax payloads with the reference's key layout.

The reference saves ``{epoch, model_state_dict, args, train_losses,
eval_losses, best_eval_loss, [scheduler_state_dict]}`` to
``<save_root>/checkpoints/final_checkpoint.pth`` (/root/reference/main.py:
1422-1437) and prior checkpoints ``{epoch, model_state_dict, loss}``
(main.py:1037-1047); restore rebuilds the model from the saved args dict
(evaluate.py:20-79). We keep the same payload keys and directory layout with
orbax as the array store plus an ``args.json`` echo for human inspection.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np
import orbax.checkpoint as ocp


def _np_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> str:
    """Save a checkpoint dict (arrays + JSON-able metadata) at ``path``
    (a directory)."""
    path = os.path.abspath(path)
    arrays = {k: _np_tree(v) for k, v in payload.items()
              if k in ("model_state_dict", "params", "batch_stats",
                       "opt_state")}
    meta = {k: v for k, v in payload.items() if k not in arrays}
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, arrays, force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=_json_default)
    args = meta.get("args")
    if args is not None:
        with open(os.path.join(path, "args.json"), "w") as f:
            json.dump(args, f, indent=2, default=_json_default)
    return path


def _json_default(o):
    # tolist before item: .item() raises on multi-element arrays, which
    # would abort the metadata write after the orbax arrays were already
    # saved (checkpoint dir left without meta.json)
    if hasattr(o, "tolist"):
        return o.tolist()
    if hasattr(o, "item"):
        return o.item()
    return str(o)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint saved by :func:`save_checkpoint`; returns the merged
    payload dict (arrays + metadata).

    A reference *torch* checkpoint file (``final_checkpoint.pth``,
    main.py:1422-1437) is accepted directly: it is imported bit-exactly via
    utils/torch_import.py, so ``evaluate.py --model_path .../*.pth`` and the
    standalone prior trainers work on reference-trained runs unchanged."""
    path = os.path.abspath(path)
    if os.path.isfile(path) and path.endswith((".pth", ".pt")):
        from movae_tpu.utils.torch_import import load_reference_checkpoint

        return load_reference_checkpoint(path)
    ckptr = ocp.PyTreeCheckpointer()
    arrays = ckptr.restore(path)
    out: Dict[str, Any] = dict(arrays)
    meta_file = os.path.join(path, "meta.json")
    if os.path.exists(meta_file):
        with open(meta_file) as f:
            out.update(json.load(f))
    return out


def final_checkpoint_path(save_root: str) -> str:
    return os.path.join(save_root, "checkpoints", "final_checkpoint")


def _prior_dir(save_root: str, prior_type: str) -> str:
    """Prior checkpoints live under ``<save_root>/<type>_prior/checkpoints``
    like the reference (main.py:913-914: 'pixelcnn_prior' /
    'pixelsnail_prior'; hierarchical variants use their base type)."""
    name = ("pixelsnail_prior" if "pixelsnail" in (prior_type or "").lower()
            else "pixelcnn_prior")
    return os.path.join(save_root, name, "checkpoints")


def best_prior_path(save_root: str, prior_type: str = "pixelcnn") -> str:
    return os.path.join(_prior_dir(save_root, prior_type), "best_prior")


def final_prior_path(save_root: str, prior_type: str = "pixelcnn") -> str:
    return os.path.join(_prior_dir(save_root, prior_type), "final_prior")
