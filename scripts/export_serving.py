#!/usr/bin/env python3
"""Export a trained checkpoint to a self-contained AOT serving artifact.

The artifact directory holds one serialized ``jax.export`` StableHLO
program per inference function (reconstruct / sample / encode_codes /
decode_codes) with the trained weights baked in as constants, plus a
``manifest.json``. It reloads ANYWHERE with just jax — no model code,
flax, or checkpoint files (movae_tpu/serving.py load_serving) — and a TPU
artifact can be produced on a CPU-only host (``--platforms cpu,tpu``).

Usage:
  python scripts/export_serving.py \
      --model_path logs/.../checkpoints/final_checkpoint \
      --out ./served_model [--platforms cpu,tpu] [--sample_batch 16]

  # then, to serve:
  #   from movae_tpu.serving import load_serving
  #   fns = load_serving("./served_model")
  #   images = fns["sample"](jax.random.PRNGKey(0))

The reference has no serving/export layer (SURVEY §1: deployment =
re-import the torch code + checkpoint); reference ``.pth`` checkpoints
also export directly (the load hook auto-imports them).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from movae_tpu.utils import (enable_persistent_compilation_cache,
                             require_live_backend)

enable_persistent_compilation_cache()
require_live_backend()  # tunnel outages HANG backend init — probe first


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model_path", required=True,
                    help="checkpoint dir (orbax) or reference .pth")
    ap.add_argument("--out", required=True, help="artifact output dir")
    ap.add_argument("--arch", default=None)
    ap.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering platforms")
    ap.add_argument("--sample_batch", type=int, default=16,
                    help="static batch for the sample() artifact")
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--no_prior", action="store_true",
                    help="skip prior auto-load (naive uniform-code sample)")
    ap.add_argument("--data_parallel", type=int, default=1,
                    help="export the image/code fns SPMD over an N-device "
                         "data mesh (N devices must be visible)")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="weight-only int8 artifacts: kernels stored as "
                         "int8 + per-output-channel scales, dequantized "
                         "in-graph (~4x smaller; VQ codebook stays float)")
    ap.add_argument("--kv_cache_dtype", default="int8",
                    choices=["f32", "bf16", "int8"],
                    help="PixelSNAIL sampler KV-cache precision baked into "
                         "the sample artifact (int8 = production default; "
                         "f32 = bitwise naive-equality configuration)")
    args = ap.parse_args()

    from movae_tpu.serving import export_checkpoint

    manifest = export_checkpoint(
        args.model_path, args.out, arch=args.arch,
        platforms=tuple(p.strip() for p in args.platforms.split(",") if p),
        sample_batch=args.sample_batch, with_prior=not args.no_prior,
        temperature=args.temperature, data_parallel=args.data_parallel,
        quantize=args.quantize, kv_cache_dtype=args.kv_cache_dtype)
    print(json.dumps(manifest, indent=2, sort_keys=True))
    print(f"exported {len(manifest['functions'])} functions -> {args.out}")


if __name__ == "__main__":
    main()
