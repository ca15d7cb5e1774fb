#!/usr/bin/env python3
"""Convert a reference MO-VAE torch checkpoint into this framework's format.

Reference users bring ``final_checkpoint.pth`` (main.py:1422-1437) or prior
checkpoints ``best_prior.pth``/``final_prior.pth`` (main.py:1037-1047);
this writes an orbax checkpoint directory that evaluate.py /
train_prior_vqvae*.py / generate_samples_* load directly. Conversion is
bit-exact (tests/test_torch_import.py).

    # VAE/VQ-VAE/... model checkpoint (args are read from the .pth echo):
    python scripts/import_torch_checkpoint.py \
        --torch_ckpt .../final_checkpoint.pth --out ./imported_ckpt

    # prior checkpoint (arch given explicitly; config inferred from shapes):
    python scripts/import_torch_checkpoint.py \
        --torch_ckpt .../best_prior.pth --arch pixelsnail --out ./prior_ckpt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movae_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

PRIORS = ("pixelcnn", "pixelsnail", "hierarchical_pixelcnn",
          "hierarchical_pixelsnail")


def _input_size_from_dataset(name):
    """Per-dataset input sizes (reference utils/utils.py:144-426)."""
    if not name:
        return None
    n = name.lower()
    if n.startswith("synthetic-"):
        try:
            return int(n.split("-")[1])
        except (IndexError, ValueError):
            return None
    return {"cifar10": 32, "cifar100": 32, "celeba": 64, "celeba-128": 128,
            "celeba-hq": 256, "imagenet": 256, "oxford-flower-102": 256,
            "flowers102": 256, "afhq": 256, "animal-face": 256}.get(n)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", type=str, required=True)
    p.add_argument("--out", type=str, required=True,
                   help="output checkpoint directory (orbax)")
    p.add_argument("--arch", type=str, default=None,
                   help="override/supply the arch (required for prior "
                        "checkpoints, which carry no args echo)")
    p.add_argument("--input_size", type=int, default=None)
    args = p.parse_args()

    import jax
    from flax import traverse_util

    from movae_tpu.train import checkpoint as ckpt_lib
    from movae_tpu.utils.torch_import import (import_torch_state_dict,
                                              load_torch_state_dict,
                                              prior_from_state)

    state, meta = load_torch_state_dict(args.torch_ckpt)
    saved_args = dict(meta.get("args") or {})
    arch = (args.arch or saved_args.get("arch") or "").lower()
    if not arch:
        raise SystemExit("no arch in the checkpoint args; pass --arch")

    params, bstats = import_torch_state_dict(state, arch)

    # validate the imported tree against a freshly initialized model
    if arch in PRIORS:
        # the importer works on its own copy, so ``state`` is intact here
        model = prior_from_state(state, arch)
        import jax.numpy as jnp
        if arch.startswith("hierarchical"):
            init_args = (jnp.zeros((1, 2, 2), jnp.int32),
                         jnp.zeros((1, 4, 4), jnp.int32))
        else:
            init_args = (jnp.zeros((1, 4, 4), jnp.int32),)
        expect = model.init(jax.random.PRNGKey(0), *init_args)["params"]
    else:
        from movae_tpu.models import get_network, init_model

        input_size = (args.input_size or saved_args.get("input_size")
                      or _input_size_from_dataset(saved_args.get("dataset")))
        if input_size is None:
            raise SystemExit("input_size not in checkpoint args; pass "
                             "--input_size")
        saved_args.setdefault("batch_size", 64)
        saved_args.setdefault("dataset_size", 50000)
        model = get_network(int(input_size), 3, saved_args)
        expect, _ = init_model(model, jax.random.PRNGKey(0),
                               int(input_size), 3, batch_size=2)

    got = {k: v.shape for k, v in traverse_util.flatten_dict(params).items()}
    want = {k: v.shape
            for k, v in traverse_util.flatten_dict(expect).items()}
    if got != want:
        missing = sorted(set(want) - set(got))[:5]
        extra = sorted(set(got) - set(want))[:5]
        shapes = [k for k in set(got) & set(want) if got[k] != want[k]][:5]
        raise SystemExit(f"imported tree mismatch: missing={missing} "
                         f"extra={extra} shape-mismatch={shapes}")

    payload = {
        "model_state_dict": {"params": params, "batch_stats": bstats},
        "args": saved_args,
    }
    if meta.get("epoch") is not None:
        payload["epoch"] = meta["epoch"]
    for k in ("train_losses", "eval_losses", "best_eval_loss", "loss"):
        if k in meta:
            try:
                import json

                json.dumps(meta[k])
                payload[k] = meta[k]
            except (TypeError, ValueError):
                pass
    out = ckpt_lib.save_checkpoint(os.path.abspath(args.out), payload)
    n = len(got)
    print(f"imported {n} tensors ({arch}) -> {out}")


if __name__ == "__main__":
    main()
