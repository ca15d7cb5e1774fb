#!/usr/bin/env python3
"""Offline re-join of a saved step_profile trace: parses the xplane proto
and the hlo.txt that step_profile.py drops next to it, and prints the same
per-opcode rollup / per-op table without touching the TPU. Lets the
analysis iterate while the chip (or the axon tunnel) is busy.

    python scripts/trace_join.py --trace_dir /tmp/trace_headline \
        [--flops 1525e9 --bytes 6.949e9] [--steps 10] [--top 30]
"""

import argparse
import collections
import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from step_profile import (PEAK_FLOPS, PEAK_HBM, load_device_op_times,
                          op_bytes, parse_hlo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace_dir", required=True)
    p.add_argument("--steps", type=int, default=None,
                   help="override the step count recorded in meta.json "
                        "(falls back to 10 if neither is available)")
    p.add_argument("--flops", type=float, default=0)
    p.add_argument("--bytes", type=float, default=0)
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args()

    # step_profile.py persists the capture's step count (and cost_analysis
    # totals) into meta.json; prefer that over a guessed flag so re-joining
    # a --steps 8 trace can't silently deflate per-step times by 1.25x.
    meta = {}
    meta_path = os.path.join(args.trace_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if args.steps is None:
        args.steps = int(meta.get("steps", 10))
    if not args.flops:
        args.flops = float(meta.get("flops", 0))
    if not args.bytes:
        args.bytes = float(meta.get("bytes", 0))

    hlo_path = os.path.join(args.trace_dir, "hlo.txt")
    defs, entry = ({}, set())
    if os.path.exists(hlo_path):
        with open(hlo_path) as f:
            defs, entry = parse_hlo(f.read())
    times, summary = load_device_op_times(args.trace_dir, args.steps)

    rows = []
    for name, secs in sorted(times.items(), key=lambda kv: -kv[1]):
        base = name.split(" = ")[0].strip().lstrip("%")
        d = defs.get(base)
        byts = op_bytes(base, defs) if d else 0
        opcode = d[1] if d else "?"
        rows.append(dict(op=base or name[:60], opcode=opcode, us=secs * 1e6,
                         bytes=byts, gbps=byts / secs / 1e9 if secs else 0))

    total = sum(r["us"] for r in rows)
    mod_us = summary.get("module_s_per_step", 0) * 1e6
    print(f"module exec/step  : {mod_us:.1f} us  (sync-op sum {total:.1f} us "
          f"over {len(rows)} ops; async-DMA "
          f"{summary.get('async_s_per_step', 0)*1e6:.1f} us, overlapped)")
    if args.bytes:
        t_hbm = args.bytes / PEAK_HBM * 1e6
        print(f"roofline          : flops {args.flops/PEAK_FLOPS*1e6:.1f} us, "
              f"HBM {t_hbm:.1f} us -> "
              f"{(t_hbm/mod_us*100) if mod_us else 0:.1f}% of HBM bound")

    by_code = collections.Counter()
    bytes_by_code = collections.Counter()
    for r in rows:
        by_code[r["opcode"]] += r["us"]
        bytes_by_code[r["opcode"]] += r["bytes"]
    print("\nper-opcode rollup (us/step):")
    for code, us in by_code.most_common(14):
        b = bytes_by_code[code]
        print(f"  {code:<28} {us:8.1f}  {us/total*100:5.1f}%  "
              f"{b/1e6:9.2f} MB  {b/us/1e3 if us else 0:6.0f} GB/s")

    print(f"\n{'op':<50} {'code':<22} {'us':>8} {'%':>5} {'MB':>8} {'GB/s':>7}")
    for r in rows[:args.top]:
        print(f"{r['op'][:50]:<50} {r['opcode']:<22} {r['us']:8.1f} "
              f"{r['us']/total*100:5.1f} {r['bytes']/1e6:8.2f} "
              f"{r['gbps']:7.0f}")


if __name__ == "__main__":
    main()
