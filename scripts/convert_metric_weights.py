#!/usr/bin/env python3
"""Convert torchvision pretrained InceptionV3/VGG16 weights for the metric
towers.

Run this wherever torchvision is installed (it is NOT part of this
framework's dependencies), then point the training environment at the
outputs:

    python scripts/convert_metric_weights.py --out_dir metric_weights/
    export MOVAE_INCEPTION_WEIGHTS=metric_weights/inception_v3.npz
    export MOVAE_VGG16_WEIGHTS=metric_weights/vgg16.npz

With these set, FID/IS/KID/LPIPS use the standard pretrained features
(absolute-scale, comparable to published numbers). Without them the towers
fall back to fixed-seed random features (relative-only; a warning is
printed). The key mapping and axis transposes are round-trip tested in
tests/test_weight_converters.py.
"""

import argparse
import os
import sys

# runnable as `python scripts/convert_metric_weights.py` from anywhere:
# movae_tpu lives at the repo root, not on sys.path when cwd is scripts/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_sd(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return obj


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", type=str, default="metric_weights")
    p.add_argument("--skip_inception", action="store_true")
    p.add_argument("--skip_vgg", action="store_true")
    p.add_argument("--inception_sd", type=str, default=None,
                   help="convert a saved torchvision-layout inception_v3 "
                        "state_dict .pth instead of instantiating "
                        "torchvision (dress-rehearsal / air-gapped path)")
    p.add_argument("--vgg_sd", type=str, default=None,
                   help="ditto for a saved vgg16 state_dict .pth")
    a = p.parse_args()
    os.makedirs(a.out_dir, exist_ok=True)

    if not (a.inception_sd and a.vgg_sd):
        try:
            import torchvision
        except ImportError:
            raise SystemExit(
                "torchvision is required (run this on a machine that has "
                "it: pip install torchvision) — or pass --inception_sd / "
                "--vgg_sd state_dict files saved elsewhere")

    if not a.skip_inception:
        from movae_tpu.metrics.inception import convert_torch_weights

        if a.inception_sd:
            sd = _load_sd(a.inception_sd)
        else:
            model = torchvision.models.inception_v3(
                weights=(torchvision.models.Inception_V3_Weights
                         .IMAGENET1K_V1),
                aux_logits=True)
            sd = model.state_dict()
        out = os.path.join(a.out_dir, "inception_v3.npz")
        convert_torch_weights(sd, out)
        print(f"wrote {out}  (export MOVAE_INCEPTION_WEIGHTS={out})")

    if not a.skip_vgg:
        from movae_tpu.metrics.vgg import convert_torch_weights

        if a.vgg_sd:
            sd = _load_sd(a.vgg_sd)
        else:
            model = torchvision.models.vgg16(
                weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1)
            sd = model.state_dict()
        out = os.path.join(a.out_dir, "vgg16.npz")
        convert_torch_weights(sd, out)
        print(f"wrote {out}  (export MOVAE_VGG16_WEIGHTS={out})")


if __name__ == "__main__":
    main()
