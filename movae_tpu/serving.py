"""AOT serving export: self-contained StableHLO inference artifacts.

The reference framework has no serving layer at all (SURVEY §1: one Python
process drives one device; deployment means re-importing the torch model
code and checkpoint). This module is the TPU-native serving story built on
``jax.export``:

  * the jitted inference functions (reconstruct / sample / encode_codes /
    decode_codes) are traced with the trained weights captured as
    CONSTANTS, so one artifact file is the whole deployable — no model
    code, no checkpoint, no flax at load time, just jax;
  * lowering is platform-parameterized: a TPU serving artifact can be
    produced on a CPU-only build host (``platforms=("cpu", "tpu")``) and
    the right branch is picked at run time;
  * image-in/image-out functions export with a SYMBOLIC batch dimension
    where the program allows it, so one artifact serves any batch size
    (fixed-shape fallback otherwise — e.g. the autoregressive samplers,
    whose pixel loops carry fixed-shape caches);
  * the serialized calling convention is versioned by jax.export, so
    artifacts keep loading across jax upgrades within the supported
    window.

Artifacts are one directory: ``<name>.jaxexport`` blobs plus a
``manifest.json`` describing each function's signature, platforms and
provenance. ``load_serving`` restores them to plain callables.

Reference parity anchor: the exported functions mirror the reference's
inference surfaces — ``model(images)["recons"]`` (main.py:159),
``net.sample(n, device)`` (vae.py:230-245), ``get_code_indices`` /
``decode_code`` (vq_vae.py:393-423) and prior-driven generation
(main.py:1054-1085) — as pure compiled programs.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from movae_tpu.train.step import preprocess_batch

SUFFIX = ".jaxexport"
MANIFEST = "manifest.json"


def _spec(x) -> Dict[str, Any]:
    return {"shape": [str(d) for d in x.shape], "dtype": str(x.dtype)}


def quantize_params(params, exclude: Sequence[str] = ("embedding",)):
    """Weight-only symmetric int8 quantization of a params pytree.

    Every leaf with ndim >= 2 whose path avoids ``exclude`` substrings is
    replaced by ``{"_q8": int8, "_scale": float32}`` with a per-OUTPUT-
    channel scale (max-abs over all axes but the last — flax Dense/Conv/
    ConvTranspose kernels all put output features last). Biases, norm
    parameters and 1-D leaves stay float. The VQ codebook ("embedding") is
    excluded by default: its values drive the discrete nearest-code argmin,
    where quantization error would flip code assignments rather than add
    bounded output noise.

    The reference has no quantized deployment path at all (torch f32
    checkpoints, SURVEY §1); this is a serving-side extension: artifacts
    shrink ~4x and weight HBM traffic drops for weight-bound inference.
    """
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, w in flat.items():
        name = "/".join(str(p) for p in path)
        w = jnp.asarray(w)
        if w.ndim < 2 or any(e in name for e in exclude):
            out[path] = w
            continue
        axes = tuple(range(w.ndim - 1))
        s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axes,
                    keepdims=True) / 127.0
        s = jnp.maximum(s, 1e-12)
        q8 = jnp.clip(jnp.round(w.astype(jnp.float32) / s),
                      -127, 127).astype(jnp.int8)
        out[path] = {"_q8": q8, "_scale": s}
    return traverse_util.unflatten_dict(out)


def _is_qleaf(n) -> bool:
    return isinstance(n, dict) and "_q8" in n


def dequantize_params(qparams):
    """Inverse of :func:`quantize_params`: ``W ~= q8 * scale`` per leaf.
    Called INSIDE the traced serving functions so the int8 arrays are the
    captured artifact constants and the dequant runs in-graph."""
    return jax.tree_util.tree_map(
        lambda n: (n["_q8"].astype(jnp.float32) * n["_scale"]
                   if _is_qleaf(n) else n),
        qparams, is_leaf=_is_qleaf)


def build_serving_fns(model, params, batch_stats, *,
                      normalize_inputs: bool = False,
                      prior: Optional[Dict[str, Any]] = None,
                      sample_batch: int = 16,
                      temperature: float = 1.0,
                      image_batch: int = 8,
                      input_size: Optional[int] = None,
                      quantize: Optional[str] = None,
                      kv_cache_dtype: str = "int8") -> Dict[str, Tuple]:
    """Pure inference callables (weights closed over) + example args.

    Returns ``{name: (fn, example_args, symbolic_batch_ok)}``:

      * ``reconstruct(x_uint8_nhwc) -> recons`` — every arch; input is the
        serving-friendly raw uint8 image batch, the float cast/normalize
        runs in-graph (train/step.py preprocess_batch, same as the train
        hot loop).
      * ``sample(key) -> images`` — fixed ``sample_batch``; prior-driven
        for VQ models when a trained prior is supplied
        (final_metrics._generate_samples_impl semantics), plain
        ``model.sample`` otherwise.
      * ``encode_codes(x_uint8) -> indices`` and
        ``decode_codes(indices) -> images`` — VQ families
        (``get_code_indices[_pair]`` / ``decode_code``); hierarchical
        models take/return the (top, bottom) pair.

    ``symbolic_batch_ok`` marks functions whose leading axis may be
    exported symbolically (everything except ``sample``: the
    autoregressive pixel loops and ``num_samples`` are static).

    ``quantize="int8"`` exports weight-only int8 artifacts: the model's
    >=2-D kernels are stored as int8 + per-output-channel scales
    (:func:`quantize_params`) and dequantized in-graph, so the artifact
    constants — and the weights resident in HBM — are a quarter the size.
    Prior params stay float (the autoregressive argmax chain compounds
    error; the prior is a training-side artifact anyway).

    ``kv_cache_dtype`` picks the PixelSNAIL sampler KV-cache precision
    baked into the ``sample`` artifact (same spellings as the CLIs'
    ``--kv_cache_dtype``: int8 production default / bf16 / f32 bitwise
    naive-equality configuration — models/pixelcnn.py KV_CACHE_DTYPES).
    """
    if quantize is not None:
        if quantize != "int8":
            raise ValueError(f"unsupported quantize={quantize!r} "
                             f"(only 'int8')")
        qparams = quantize_params(params)

        def _vars():
            # dequant must trace INSIDE each exported fn so the artifact
            # captures the int8 tensors as its constants
            return {"params": dequantize_params(qparams),
                    "batch_stats": batch_stats or {}}
    else:
        def _vars():
            return {"params": params, "batch_stats": batch_stats or {}}

    size = int(input_size if input_size is not None
               else getattr(model, "input_size"))

    def reconstruct(x):
        xf = preprocess_batch(x, normalize_inputs)
        out = model.apply(_vars(), xf, train=False,
                          rngs={"sample": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(0)})
        return out["recons"].astype(jnp.float32)

    x_ex = jnp.zeros((image_batch, size, size, 3), jnp.uint8)
    fns: Dict[str, Tuple] = {"reconstruct": (reconstruct, (x_ex,), True)}

    hierarchical = hasattr(model, "latent_spatial_dim_top")
    is_vq = hasattr(model, "num_embeddings")
    if is_vq:
        if hierarchical:
            def encode_codes(x):
                xf = preprocess_batch(x, normalize_inputs)
                return model.apply(_vars(), xf,
                                   method="get_code_indices_pair")

            def decode_codes(code_t, code_b):
                return model.apply(_vars(), code_t, code_b,
                                   method="decode_code").astype(jnp.float32)

            st = model.latent_spatial_dim_top
            sb = model.latent_spatial_dim_bottom
            code_ex = (jnp.zeros((image_batch, st, st), jnp.int32),
                       jnp.zeros((image_batch, sb, sb), jnp.int32))
        else:
            def encode_codes(x):
                xf = preprocess_batch(x, normalize_inputs)
                return model.apply(_vars(), xf, method="get_code_indices")

            def decode_codes(codes):
                return model.apply(_vars(), codes,
                                   method="decode_code").astype(jnp.float32)

            s = model.latent_spatial_dim
            code_ex = (jnp.zeros((image_batch, s, s), jnp.int32),)
        fns["encode_codes"] = (encode_codes, (x_ex,), True)
        fns["decode_codes"] = (decode_codes, code_ex, True)

    if prior is not None and is_vq:
        from movae_tpu.models.pixelcnn import (KV_CACHE_DTYPES,
                                               sample_hierarchical,
                                               sample_prior)
        pm, pp = prior["model"], prior["params"]
        cache_dtype = KV_CACHE_DTYPES[kv_cache_dtype]

        if prior.get("hierarchical"):
            def sample(key):
                z_top, z_bottom = sample_hierarchical(
                    pm, pp, key, sample_batch,
                    (model.latent_spatial_dim_top,) * 2,
                    (model.latent_spatial_dim_bottom,) * 2,
                    temperature=temperature, cache_dtype=cache_dtype)
                return model.apply(_vars(), z_top, z_bottom,
                                   method="decode_code").astype(jnp.float32)
        else:
            def sample(key):
                s = model.latent_spatial_dim
                codes = sample_prior(pm, pp, key, sample_batch, s, s,
                                     temperature=temperature,
                                     cache_dtype=cache_dtype)
                return model.apply(_vars(), codes,
                                   method="decode_code").astype(jnp.float32)
    else:
        def sample(key):
            return model.apply(_vars(), sample_batch, method="sample",
                               rngs={"sample": key, "dropout": key}
                               ).astype(jnp.float32)

    fns["sample"] = (sample, (jax.random.PRNGKey(0),), False)
    return fns


def _export_one(fn, example_args, platforms, symbolic_batch, mesh=None):
    """Export ``fn``; symbolic leading batch dim when requested and the
    program supports it (falls back to the example's fixed shapes).

    With ``mesh`` the function is exported SPMD over the mesh's 'data'
    axis: the leading batch axis of every array argument and output is
    sharded (GSPMD partitions the body), and the symbolic batch becomes
    ``<n>*b`` so any multiple of the device count serves."""
    if mesh is None:
        jf = jax.jit(fn)
        dim = "b"
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(mesh, P("data"))
        jf = jax.jit(fn, in_shardings=tuple(sh for _ in example_args),
                     out_shardings=sh)
        dim = f"{int(mesh.shape['data'])}*b"
    if symbolic_batch:
        try:
            (b,) = jax_export.symbolic_shape(dim)
            specs = tuple(
                jax.ShapeDtypeStruct((b,) + tuple(a.shape[1:]), a.dtype)
                for a in example_args)
            return jax_export.export(jf,
                                     platforms=list(platforms))(*specs), True
        except Exception as e:  # pragma: no cover - shape-dependent
            print(f"[serving] symbolic-batch export failed ({e}); "
                  f"falling back to fixed shapes")
    return jax_export.export(jf, platforms=list(platforms))(*example_args), False


def export_serving(model, params, batch_stats, out_dir: str, *,
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   data_parallel: int = 1,
                   manifest_extra: Optional[Dict[str, Any]] = None,
                   **build_kwargs) -> Dict[str, Any]:
    """Export the serving surface of a trained model to ``out_dir``.

    Writes one ``<name>.jaxexport`` serialized artifact per function and a
    ``manifest.json``. Returns the manifest dict.

    ``data_parallel=N`` exports the image/code functions SPMD over an
    N-device mesh (batch sharded on 'data'; GSPMD partitions the body) —
    one artifact drives a whole serving slice. N devices must be visible
    at export time (virtual CPU devices via
    ``--xla_force_host_platform_device_count`` work) and at load time;
    batches must be a multiple of N. ``sample`` stays single-device (its
    autoregressive caches are replicated state; for sharded generation
    use the training pipeline's sample-parallel path)."""
    os.makedirs(out_dir, exist_ok=True)
    mesh = None
    if data_parallel > 1:
        from movae_tpu.parallel.mesh import make_mesh
        if len(jax.devices()) < data_parallel:
            raise ValueError(
                f"data_parallel={data_parallel} needs that many devices "
                f"visible at export time, have {len(jax.devices())} "
                f"(virtual CPU devices work: "
                f"XLA_FLAGS=--xla_force_host_platform_device_count=N)")
        mesh = make_mesh(num_data=data_parallel,
                         devices=jax.devices()[:data_parallel])
    fns = build_serving_fns(model, params, batch_stats, **build_kwargs)
    manifest: Dict[str, Any] = {
        "format": "jax.export", "jax_version": jax.__version__,
        "platforms": list(platforms),
        "quantize": build_kwargs.get("quantize"),
        "kv_cache_dtype": build_kwargs.get("kv_cache_dtype", "int8"),
        "functions": {}}
    manifest.update(manifest_extra or {})
    for name, (fn, example, sym) in fns.items():
        fn_mesh = mesh if sym else None  # sample() stays single-device
        if fn_mesh is not None:
            n = int(fn_mesh.shape["data"])
            example = tuple(
                jnp.concatenate([a] * n) if a.shape and a.shape[0] % n
                else a for a in example)
        exp, symbolic = _export_one(fn, example, platforms, sym, fn_mesh)
        blob = exp.serialize()
        with open(os.path.join(out_dir, name + SUFFIX), "wb") as f:
            f.write(blob)
        manifest["functions"][name] = {
            "in": [_spec(jax.ShapeDtypeStruct(s.shape, s.dtype))
                   for s in exp.in_avals],
            "out": [_spec(jax.ShapeDtypeStruct(s.shape, s.dtype))
                    for s in exp.out_avals],
            "symbolic_batch": symbolic,
            "nr_devices": exp.nr_devices,
            "calling_convention": exp.calling_convention_version,
            "bytes": len(blob)}
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def load_serving(art_dir: str) -> Dict[str, Any]:
    """Restore an exported serving directory to plain jitted callables.

    Needs only jax — no model code, flax, or checkpoint. Each callable
    runs the platform branch matching the current default backend.
    Sharded artifacts (``data_parallel`` exports) are wrapped to commit
    their inputs over an ``nr_devices``-device data mesh (batch axis
    sharded, scalar/key args replicated), so callers still pass plain
    host arrays."""
    out: Dict[str, Any] = {}
    for fname in sorted(os.listdir(art_dir)):
        if not fname.endswith(SUFFIX):
            continue
        with open(os.path.join(art_dir, fname), "rb") as f:
            exp = jax_export.deserialize(f.read())
        jitted = jax.jit(exp.call)
        if exp.nr_devices > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
            n = exp.nr_devices
            if len(jax.devices()) < n:
                raise RuntimeError(
                    f"{fname}: exported for {n} devices, "
                    f"have {len(jax.devices())}")
            mesh = Mesh(np.asarray(jax.devices()[:n]), ("data",))
            batch_sh = NamedSharding(mesh, P("data"))
            repl_sh = NamedSharding(mesh, P())

            def call(*args, _j=jitted, _n=n, _b=batch_sh, _r=repl_sh,
                     _f=fname):
                placed = []
                for a in args:
                    if getattr(a, "ndim", 0) > 1:
                        if a.shape[0] % _n != 0:
                            raise ValueError(
                                f"{_f}: sharded artifact needs the batch "
                                f"to be a multiple of {_n}, got "
                                f"{a.shape[0]}")
                        placed.append(jax.device_put(a, _b))
                    else:  # keys / scalars replicate
                        placed.append(jax.device_put(a, _r))
                return _j(*placed)

            out[fname[:-len(SUFFIX)]] = call
        else:
            out[fname[:-len(SUFFIX)]] = jitted
    return out


def load_manifest(art_dir: str) -> Dict[str, Any]:
    with open(os.path.join(art_dir, MANIFEST)) as f:
        return json.load(f)


def _model_from_checkpoint(model_path: str, arch: Optional[str]):
    """Rebuild (model, params, batch_stats, args, input_size) from a saved
    checkpoint WITHOUT touching the dataset files (evaluate.py's loader
    builds the dataset; serving export must not need data on disk) —
    input_size comes from the dataset NAME (data.dataset_input_size)."""
    from types import SimpleNamespace

    from movae_tpu.data import dataset_input_size
    from movae_tpu.models import get_network
    from movae_tpu.train import checkpoint as ckpt_lib

    payload = ckpt_lib.load_checkpoint(model_path)
    args = SimpleNamespace(**(payload.get("args") or {}))
    if arch is not None:
        # mismatches warn and the checkpoint wins — the saved weights only
        # fit the saved arch (same policy as evaluate.py's loader,
        # reference evaluate.py:48-59)
        saved_arch = getattr(args, "arch", None)
        if saved_arch is not None and saved_arch.lower() != arch.lower():
            print(f"Warning: checkpoint arch ({saved_arch}) does not match "
                  f"provided arch ({arch}); using the checkpoint arch.")
        else:
            args.arch = arch
    input_size = dataset_input_size(getattr(args, "dataset", "cifar10"))
    model = get_network(input_size, 3, args)
    sd = payload["model_state_dict"]
    return (model, sd["params"], sd.get("batch_stats", {}) or {}, args,
            input_size)


def export_checkpoint(model_path: str, out_dir: str, *,
                      arch: Optional[str] = None,
                      platforms: Sequence[str] = ("cpu", "tpu"),
                      sample_batch: int = 16,
                      with_prior: bool = True,
                      temperature: float = 1.0,
                      data_parallel: int = 1,
                      quantize: Optional[str] = None,
                      kv_cache_dtype: str = "int8") -> Dict[str, Any]:
    """One-call checkpoint -> serving-artifact export (CLI entry).

    Auto-loads a trained prior next to the checkpoint
    (train.prior.find_prior) so ``sample`` is prior-driven like the
    training pipeline's generation pass."""
    model, params, bstats, args, input_size = _model_from_checkpoint(
        model_path, arch)
    prior = None
    if with_prior and hasattr(model, "num_embeddings"):
        from movae_tpu.train.prior import find_prior
        prior = find_prior(model_path, model, args)
    manifest = export_serving(
        model, params, bstats, out_dir, platforms=platforms,
        data_parallel=data_parallel,
        manifest_extra={"arch": getattr(args, "arch", None),
                        "dataset": getattr(args, "dataset", None),
                        "input_size": input_size,
                        "prior": (None if prior is None else
                                  type(prior["model"]).__name__),
                        "source_checkpoint": os.path.abspath(model_path)},
        normalize_inputs=bool(getattr(args, "normalize_inputs", False)),
        prior=prior, sample_batch=sample_batch, temperature=temperature,
        input_size=input_size, quantize=quantize,
        kv_cache_dtype=kv_cache_dtype)
    return manifest
