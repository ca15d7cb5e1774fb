#!/usr/bin/env python3
"""Export one of this framework's checkpoints to a reference-torch ``.pth``.

The inverse of scripts/import_torch_checkpoint.py: the output loads into
the torch reference's models with ``load_state_dict`` (strict modulo
non-parameter buffers) and into its evaluate.py restore path
(evaluate.py:34-73, strict=False), so runs trained here can be inspected
or continued with torch tooling.

    python scripts/export_torch_checkpoint.py \
        --ckpt logs/.../checkpoints/final_checkpoint --out exported.pth \
        [--arch vq_vae]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from movae_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True,
                   help="checkpoint directory written by this framework")
    p.add_argument("--out", type=str, required=True, help="output .pth path")
    p.add_argument("--arch", type=str, default=None,
                   help="override the arch (default: the checkpoint args; "
                        "for prior checkpoints pass pixelcnn/pixelsnail/"
                        "hierarchical_*)")
    args = p.parse_args()

    import torch

    from movae_tpu.train import checkpoint as ckpt_lib
    from movae_tpu.utils.torch_export import export_torch_state_dict

    payload = ckpt_lib.load_checkpoint(args.ckpt)
    saved_args = dict(payload.get("args") or {})
    prior_args = dict(payload.get("prior_args") or {})
    arch = (args.arch or saved_args.get("arch")
            or prior_args.get("prior_type") or "").lower()
    if not arch:
        raise SystemExit("no arch in the checkpoint; pass --arch")
    sd = payload["model_state_dict"]
    state = export_torch_state_dict(sd.get("params", {}),
                                    sd.get("batch_stats", {}), arch)
    out_payload = {
        "model_state_dict": {k: torch.tensor(v) for k, v in state.items()},
    }
    if saved_args:
        out_payload["args"] = saved_args
    for k in ("epoch", "loss", "best_eval_loss"):
        if payload.get(k) is not None:
            out_payload[k] = payload[k]
    torch.save(out_payload, args.out)
    print(f"exported {len(state)} tensors ({arch}) -> {args.out}")


if __name__ == "__main__":
    main()
