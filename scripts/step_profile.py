#!/usr/bin/env python3
"""Per-op roofline breakdown of a train step (r2 VERDICT weak items 2+3).

Captures a jax.profiler device trace of the jitted train step, parses the
xplane proto directly (tensorflow.tsl xplane_pb2 — the plugin's converter
is version-broken in this env), sums device time per HLO op, and joins
each op against its bytes-accessed/FLOPs estimate from the optimized HLO
text. The result is a ranked table: which fusions hold the step away from
the HBM/MXU roofline (scripts/step_cost.py computes the aggregate bound;
this attributes it).

    python scripts/step_profile.py --batch_size 1024 --agg sum
    python scripts/step_profile.py --batch_size 64 --input_size 256 \
        --agg upgrad   # the UPGrad 256px gap study

Falls back to the static bytes ranking (no timings) if the axon tunnel
does not ship device trace events.
"""

import argparse
import collections
import glob
import json
import math
import os
import re
import sys
import time

# must be set before any protobuf import (jax pulls protobuf in too)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":  # keep importable by trace_join.py w/o a backend
    from movae_tpu.utils import (enable_persistent_compilation_cache,
                                 require_live_backend)

    enable_persistent_compilation_cache()
    require_live_backend()

    import jax
    import jax.numpy as jnp
    import numpy as np

# v5e per-chip peaks
PEAK_FLOPS = 197e12   # bf16 MXU
PEAK_HBM = 819e9      # bytes/s

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "c64": 8, "c128": 16}

_SHAPE_RE = re.compile(r"\b([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(sig: str) -> int:
    """Total bytes of every typed shape literal in an HLO type signature
    (handles tuples by summing members)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(sig):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)$")
# the opcode is the first lowercase word directly followed by '(' after the
# type signature — layout/tiling parens inside sigs are uppercase (T(8,128),
# S(1)) or digit-led ((2,1)), so this anchors reliably even for tuple sigs
_OPCODE_RE = re.compile(r" ([a-z][a-z0-9\-]*)\(")


def parse_hlo(txt: str):
    """name -> (out_sig, opcode, operand names) for every instruction;
    plus the set of ENTRY instruction names."""
    defs, entry = {}, set()
    in_entry = False
    for line in txt.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
        elif line.startswith("}"):
            in_entry = False
        m = _NAME_RE.match(line)
        if not m:
            continue
        name, rest = m.groups()
        om = _OPCODE_RE.search(rest)
        if not om:
            continue
        sig, opcode = rest[:om.start()], om.group(1)
        # operand names: %foo.123 tokens in the call args (first paren group)
        depth, args = 1, ""
        for ch in rest[om.end():]:
            depth += (ch == "(") - (ch == ")")
            if depth <= 0:
                break
            args += ch
        operands = re.findall(r"%([\w.\-]+)", args)
        defs[name] = (sig, opcode, operands)
        if in_entry:
            entry.add(name)
    return defs, entry


def op_bytes(name, defs):
    """HBM traffic estimate for one top-level op: output bytes + operand
    bytes (post-fusion each top-level op's operands/results live in HBM)."""
    sig, opcode, operands = defs[name]
    total = shape_bytes(sig)
    for o in operands:
        if o in defs:
            total += shape_bytes(defs[o][0])
    return total


def build_step(args):
    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    model_args = dict(
        arch=args.arch, embedding_dim=64, num_embeddings=512,
        hidden_dims=(128, 256), num_residual_layers=2,
        batch_size=args.batch_size, dataset_size=50000,
        recons_objective="mse",
        compute_dtype="bfloat16" if jax.default_backend() != "cpu"
        else "float32",
    )
    model = get_network(args.input_size, 3, model_args)
    params, bs = init_model(model, jax.random.PRNGKey(0), args.input_size, 3,
                            batch_size=2)
    cfg = AggregatorConfig(name=args.agg,
                           num_objectives=len(model.objective_names))
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    state = TrainState.create(model.apply, params, bs, tx, init_state(cfg))
    step = jax.jit(make_train_step(model, cfg, 1, 1), donate_argnums=(0,))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (args.batch_size, args.input_size, args.input_size, 3)
    ).astype(np.float32))
    return step, state, x


def capture(step, state, x, steps, trace_dir):
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        state, metrics = step(state, x, key)
    float(metrics["total_loss"])  # host-fetch sync
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, metrics = step(state, x, key)
            float(metrics["total_loss"])
    return state


def load_device_op_times(trace_dir, steps):
    """Per-op device time from the TPU plane's 'XLA Ops' line ONLY (the
    'XLA Modules'/'Steps'/'Async XLA Ops' lines overlap the same wall time
    and would double-count). Returns ``({op: s/step}, summary)`` where
    summary carries the module-execution time per step (the true device
    step latency) and the async-DMA line total (overlapped traffic)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return {}, {}
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())
    per_op = collections.Counter()
    summary = {}
    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = plane.event_metadata
        for line in plane.lines:
            if not line.events:
                # idle planes (multi-chip hosts over the tunnel) still carry
                # empty 'XLA Modules' lines — don't clobber real totals with 0
                continue
            tot = sum(ev.duration_ps for ev in line.events)
            if line.name == "XLA Modules":
                summary["module_s_per_step"] = (
                    summary.get("module_s_per_step", 0.0) + tot / 1e12 / steps)
                summary["module_events"] = (
                    summary.get("module_events", 0) + len(line.events))
            elif line.name == "Async XLA Ops":
                summary["async_s_per_step"] = (
                    summary.get("async_s_per_step", 0.0) + tot / 1e12 / steps)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                md = meta.get(ev.metadata_id)
                if md is None:
                    continue
                per_op[md.name] += ev.duration_ps
    return {k: v / 1e12 / steps for k, v in per_op.items()}, summary


def classify(opcode, flops, byts, secs):
    if secs and byts / PEAK_HBM >= 0.7 * secs:
        return "HBM-bound"
    if secs and flops / PEAK_FLOPS >= 0.7 * secs:
        return "MXU-bound"
    return ""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--agg", type=str, default="sum")
    p.add_argument("--arch", type=str, default="vq_vae")
    p.add_argument("--input_size", type=int, default=32)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--trace_dir", default="/tmp/step_profile_trace")
    p.add_argument("--json", default=None)
    args = p.parse_args()

    step, state, x = build_step(args)
    lowered = step.lower(state, x, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    txt = compiled.as_text()
    defs, entry = parse_hlo(txt)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]

    os.makedirs(args.trace_dir, exist_ok=True)
    with open(os.path.join(args.trace_dir, "hlo.txt"), "w") as f:
        f.write(txt)  # keep alongside the trace for offline re-joins
    with open(os.path.join(args.trace_dir, "meta.json"), "w") as f:
        json.dump({"steps": args.steps,
                   "flops": ca.get("flops", 0),
                   "bytes": ca.get("bytes accessed", 0)}, f)
    state = capture(step, state, x, args.steps, args.trace_dir)
    times, summary = load_device_op_times(args.trace_dir, args.steps)
    if not times:
        print("NO DEVICE EVENTS in trace; static bytes ranking only")

    # join: 'XLA Ops' metadata names are the full HLO instruction text
    # ("%fusion.12 = bf16[...] fusion(...)"); key on the %name prefix.
    rows = []
    known = set()
    for name, secs in sorted(times.items(), key=lambda kv: -kv[1]):
        base = name.split(" = ")[0].strip().lstrip("%")
        d = defs.get(base)
        byts = op_bytes(base, defs) if d else 0
        if d:
            opcode = d[1]
        else:
            om = _OPCODE_RE.search(name)
            opcode = om.group(1) if om else "?"
        rows.append(dict(op=base or name[:60], opcode=opcode, us=secs * 1e6,
                         bytes=byts, gbps=byts / secs / 1e9 if secs else 0))
        known.add(base)

    total = sum(r["us"] for r in rows)
    mod_us = summary.get("module_s_per_step", 0) * 1e6
    async_us = summary.get("async_s_per_step", 0) * 1e6
    t_hbm = ca.get("bytes accessed", 0) / PEAK_HBM * 1e6
    print(f"\nmodule exec/step  : {mod_us:.1f} us   "
          f"(sync-op sum {total:.1f} us over {len(rows)} ops; "
          f"async-DMA line {async_us:.1f} us, overlapped)")
    print(f"aggregate         : flops {ca.get('flops', 0)/1e9:.1f} G, "
          f"bytes {ca.get('bytes accessed', 0)/1e9:.3f} GB")
    print(f"roofline          : flops {ca.get('flops', 0)/PEAK_FLOPS*1e6:.1f} "
          f"us, HBM {t_hbm:.1f} us -> "
          f"{(t_hbm / mod_us * 100) if mod_us else 0:.1f}% of HBM bound")

    # per-opcode rollup: where the step time lives by op class
    by_code = collections.Counter()
    for r in rows:
        by_code[r["opcode"]] += r["us"]
    print("\nper-opcode rollup (us/step):")
    for code, us in by_code.most_common(12):
        print(f"  {code:<28} {us:8.1f}  {us/total*100:5.1f}%")

    print(f"\n{'op':<58} {'code':<14} {'us':>8} {'%':>5} "
          f"{'MB':>8} {'GB/s':>7}")
    for r in rows[:args.top]:
        print(f"{r['op'][:58]:<58} {r['opcode']:<14} {r['us']:8.1f} "
              f"{r['us']/total*100:5.1f} {r['bytes']/1e6:8.2f} "
              f"{r['gbps']:7.0f}")

    # static ranking for entry ops the tracer didn't name (or no trace)
    missing = [(n, op_bytes(n, defs)) for n in entry
               if n not in known and defs[n][1] not in ("parameter",)]
    missing.sort(key=lambda kv: -kv[1])
    if not times:
        print("\nstatic bytes ranking (top entry ops):")
        for n, b in missing[:args.top]:
            print(f"{n[:58]:<58} {defs[n][1]:<14} {b/1e6:8.2f} MB")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(dict(total_us=total, module_us=mod_us,
                           async_us=async_us, rows=rows[:args.top],
                           by_opcode=dict(by_code.most_common(20)),
                           flops=ca.get("flops", 0),
                           bytes=ca.get("bytes accessed", 0)), f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
