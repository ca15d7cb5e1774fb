"""One-time extractor: reference configs/ tree -> scripts/config_matrix.json.

The reference experiment matrix (/root/reference/configs/, 1,498 YAMLs +
182 run-list .txt files, accreted over several generator eras with
per-cell hyperparameter quirks) is the spec for our configs/ tree.  This
script walks the reference tree and factors it into a compact checked-in
manifest:

  {dataset: {arch: {"base": {...common params...},
                    "cells": [{"agg": folder, "objective": mse|bce,
                               "seeds": {idx: seed_value},
                               "delta": {...params differing from base...},
                               "group": wandb_group}],
                    "txt": [per-agg txt scopes]}}}

``generate_vae_configs.py`` consumes the manifest to re-emit the exact
same file tree (``diff <(find ref) <(find ours)`` empty) with our own
uniform YAML rendering.  Scalar values are kept as raw strings so
scientific-notation literals (``1e-4``, ``2.5e-4``) survive round-trip.

Run: python scripts/extract_config_matrix.py [--ref /root/reference/configs]
(only needed when re-deriving the manifest; the manifest itself is
checked in so users never need the reference tree).
"""

import argparse
import collections
import json
import os
import re
from pathlib import Path

PROJECT_ROOT = Path(__file__).resolve().parent.parent

# Fields excluded from per-cell params (derived at generation time).
DERIVED = {"seed", "wandb_name", "wandb_entity"}


def parse_flat_yaml(path):
    """Ordered flat-YAML parser (scalars as raw strings)."""
    out = {}
    lines = Path(path).read_text().splitlines()
    i = 0
    while i < len(lines):
        raw = lines[i]
        if not raw.strip() or raw.lstrip().startswith("#"):
            i += 1
            continue
        m = re.match(r"^([A-Za-z0-9_.]+):\s*(.*)$", raw)
        assert m, (path, raw)
        key, val = m.group(1), m.group(2).strip()
        if val:
            out[key] = val
            i += 1
            continue
        # container: look ahead
        i += 1
        if i < len(lines) and lines[i].startswith("- "):
            items = []
            while i < len(lines) and lines[i].startswith("- "):
                items.append(lines[i][2:].strip())
                i += 1
            out[key] = items
        else:
            sub = {}
            while i < len(lines) and lines[i].startswith("  ") \
                    and ":" in lines[i]:
                k, v = lines[i].strip().split(":", 1)
                sub[k] = v.strip()
                i += 1
            out[key] = sub
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference/configs")
    ap.add_argument("--out",
                    default=str(PROJECT_ROOT / "scripts/config_matrix.json"))
    args = ap.parse_args()

    cells = collections.defaultdict(dict)  # (ds,arch) -> (agg,obj) -> info
    txt_extra = collections.defaultdict(list)  # (ds,arch) -> agg-scoped txts
    for dirpath, _, filenames in sorted(os.walk(args.ref)):
        rel = os.path.relpath(dirpath, args.ref)
        parts = [] if rel == "." else rel.split(os.sep)
        for fname in sorted(filenames):
            fpath = os.path.join(dirpath, fname)
            if fname.endswith(".yaml"):
                ds, arch, agg, obj = parts
                n = int(re.match(r"config_(\d+)\.yaml", fname).group(1))
                cfg = parse_flat_yaml(fpath)
                info = cells[(ds, arch)].setdefault((agg, obj), {
                    "seeds": {}, "params": None, "group": None})
                # wandb_name kept verbatim: ~270 reference files carry
                # stale name literals (e.g. "...seed123123123" for seed
                # 123123) that a derived group+seed rule would not hit.
                info["seeds"][n] = {"seed": cfg.get("seed"),
                                    "name": cfg.get("wandb_name")}
                params = {k: v for k, v in cfg.items() if k not in DERIVED}
                group = params.pop("wandb_group", None)
                if info["params"] is None:
                    info["params"], info["group"] = params, group
                else:
                    assert info["params"] == params, (
                        f"{fpath}: intra-cell param drift\n"
                        f"{info['params']}\nvs\n{params}")
                    assert info["group"] == group
            elif fname.endswith("_configs.txt") and len(parts) == 3:
                ds, arch, agg = parts
                txt_extra[(ds, arch)].append(
                    {"agg": agg, "objective": fname.split("_")[0]})

    # factor per-(ds,arch): base = most common value per key across cells
    manifest = {}
    for (ds, arch), cellmap in sorted(cells.items()):
        key_votes = collections.defaultdict(collections.Counter)
        for info in cellmap.values():
            for k, v in info["params"].items():
                key_votes[k][json.dumps(v)] += 1
        base = {k: json.loads(c.most_common(1)[0][0])
                for k, c in key_votes.items()}
        out_cells = []
        for (agg, obj), info in sorted(cellmap.items()):
            delta = {k: v for k, v in info["params"].items()
                     if base.get(k) != v}
            missing = [k for k in base if k not in info["params"]]
            cell = {"agg": agg, "objective": obj,
                    "seeds": {str(k): v for k, v in
                              sorted(info["seeds"].items())},
                    "group": info["group"]}
            if delta:
                cell["delta"] = delta
            if missing:
                cell["drop"] = missing
            out_cells.append(cell)
        entry = {"base": base, "cells": out_cells}
        extra = txt_extra.get((ds, arch))
        if extra:
            entry["agg_txt"] = sorted({e["agg"] for e in extra})
        manifest.setdefault(ds, {})[arch] = entry

    Path(args.out).write_text(json.dumps(manifest, indent=1) + "\n")
    n_yaml = sum(len(i["seeds"]) for cm in cells.values()
                 for i in cm.values())
    print(f"manifest: {len(cells)} dataset/arch entries, "
          f"{sum(len(c) for c in cells.values())} cells, {n_yaml} yamls "
          f"-> {args.out} ({os.path.getsize(args.out)} bytes)")


if __name__ == "__main__":
    main()
