"""Prior training stage (PixelCNN/PixelSNAIL over frozen VQ codes).

Equivalent of the reference ``train_pixelcnn_prior``
(/root/reference/main.py:890-1051): freeze the VQ model, extract the code
dataset (cached, movae_tpu.utils.codes_cache), train the prior with
Adam(pixelcnn_lr) + cosine annealing (T_max=pixelcnn_epochs, eta_min=1e-6)
and grad-clip 1.0, keep the best checkpoint by epoch loss, save
best_prior/final_prior.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from movae_tpu.models.pixelcnn import (
    HierarchicalPixelCNN,
    HierarchicalPixelSNAIL,
    PixelCNN,
    PixelSNAIL,
    warn_long_seq_dropout,
)
from movae_tpu.train import checkpoint as ckpt_lib
from movae_tpu.utils import AverageMeter
from movae_tpu.utils.codes_cache import CodeLoader, get_or_extract_codes


def build_prior(args, num_embeddings: int, hierarchical: bool,
                embedding_dim: int = None):
    """Prior construction per args (reference main.py:916-952). The prior's
    code-embedding width follows the VQ model's ``embedding_dim`` as in the
    reference (main.py passes ``net.embedding_dim``); callers pass
    ``model.embedding_dim`` (falls back to the args echo, then 64)."""
    prior_type = getattr(args, "prior_type", "pixelcnn")
    hc = getattr(args, "pixelcnn_hidden_channels", 128)
    nl = getattr(args, "pixelcnn_num_layers", 15)
    # --compute_dtype applies to the prior too (same resolver as the VQ
    # stage's get_network): bf16 activations feed the MXU at 2x, while the
    # logits are cast back to f32 before the CE (PixelCNN/PixelSNAIL
    # __call__) and params stay f32 (flax dtype= is compute-only)
    from movae_tpu.models import resolve_compute_dtype
    dt = resolve_compute_dtype(getattr(args, "compute_dtype", jnp.float32))
    # precedence: a prior checkpoint's own echo (the table width it was
    # actually built with) > the live VQ model's D > the VQ args echo > 64
    d = (getattr(args, "prior_embedding_dim", None) or embedding_dim
         or getattr(args, "embedding_dim", None) or 64)
    # --attention_dropout: "output" (default, flash path — 1.73x train-step
    # speedup, quality-equivalent per the BENCH.md semantics A/B) or
    # "weights" (reference-exact, pixelcnn_prior.py:126-127)
    adm = getattr(args, "attention_dropout", "output") or "output"
    if hierarchical:
        if prior_type == "pixelsnail":
            return HierarchicalPixelSNAIL(
                num_embeddings=num_embeddings, embedding_dim=d,
                hidden_channels=hc,
                num_blocks_top=getattr(args, "pixelsnail_num_blocks", 8),
                num_res_blocks_per_layer=getattr(
                    args, "pixelsnail_num_res_blocks", 2),
                num_heads=getattr(args, "pixelsnail_num_heads", 8),
                num_layers_bottom=nl,
                dropout=getattr(args, "pixelsnail_dropout", 0.1), dtype=dt,
                attn_dropout_mode=adm)
        return HierarchicalPixelCNN(num_embeddings=num_embeddings,
                                    embedding_dim=d,
                                    hidden_channels=hc, num_layers=nl,
                                    dtype=dt)
    if prior_type == "pixelsnail":
        return PixelSNAIL(
            num_embeddings=num_embeddings, embedding_dim=d,
            hidden_channels=hc,
            num_blocks=getattr(args, "pixelsnail_num_blocks", 8),
            num_res_blocks_per_layer=getattr(args, "pixelsnail_num_res_blocks",
                                             2),
            num_heads=getattr(args, "pixelsnail_num_heads", 8),
            dropout=getattr(args, "pixelsnail_dropout", 0.1), dtype=dt,
            attn_dropout_mode=adm)
    return PixelCNN(num_embeddings=num_embeddings, embedding_dim=d,
                    hidden_channels=hc, num_layers=nl, dtype=dt)


def prior_args_echo(args, embedding_dim=None) -> Dict[str, Any]:
    """Prior hyperparameters echoed into prior checkpoints so offline
    loaders can rebuild the module without re-specifying flags (the VQ
    checkpoints already echo the full args; the reference prior payload is
    only {epoch, state_dict, loss}, main.py:1037-1047)."""
    keys = ("prior_type", "pixelcnn_hidden_channels", "pixelcnn_num_layers",
            "pixelsnail_num_blocks", "pixelsnail_num_res_blocks",
            "pixelsnail_num_heads", "pixelsnail_dropout", "attention_dropout")
    echo = {k: getattr(args, k) for k in keys if hasattr(args, k)}
    # Attention-output flatten layout version. r4 fixed the PixelSNAIL
    # out_proj interleave from heads-major to the reference's dim-major
    # (reference pixelcnn_prior.py:129-131); out_proj kernels learned
    # against the old flatten are channel-permuted under the fixed module.
    # Stamp the layout so loaders can flag pre-fix movae-trained priors
    # (reference-written .pth files were always dim-major and are fine).
    echo["attn_out_layout"] = "dim_major"
    if embedding_dim is not None:
        # the table width the prior was actually built with (may differ
        # from the VQ args echo for checkpoints predating the
        # embedding_dim plumbing fix)
        echo["prior_embedding_dim"] = int(embedding_dim)
    return echo


def find_prior(model_path: str, model, vq_args) -> Optional[Dict[str, Any]]:
    """Auto-load a trained prior living next to the model checkpoint
    (<save_root>/<pixelcnn|pixelsnail>_prior/checkpoints/{best,final}_prior)
    so generation is prior-driven like the training pipeline; falls back
    to None -> naive uniform-code sampling (reference evaluate.py:318).
    Shared by evaluate.py and the serving exporter."""
    from types import SimpleNamespace

    arch = vq_args.arch.lower() if hasattr(vq_args, "arch") else ""
    if not hasattr(model, "num_embeddings"):
        return None
    save_root = os.path.dirname(os.path.dirname(os.path.abspath(model_path)))
    hier_arch = arch in ("vq_vae2", "gg_vq_vae2")
    for prior_dir in ("pixelcnn_prior", "pixelsnail_prior"):
        for name in ("best_prior", "final_prior"):
            # a locally (re)trained orbax prior wins over a reference torch
            # .pth of the same name — it is the fresher artifact
            path = os.path.join(save_root, prior_dir, "checkpoints", name)
            if os.path.exists(os.path.join(path, "meta.json")):
                try:
                    payload = ckpt_lib.load_checkpoint(path)
                    p_args = payload.get("prior_args") or {}
                    if ("pixelsnail" in prior_dir
                            and "attn_out_layout" not in p_args):
                        # pre-r4 movae-trained SNAIL priors learned out_proj
                        # against a heads-major attention flatten; the fixed
                        # module (dim-major, ref pixelcnn_prior.py:129-131)
                        # permutes their attention-output channels. See
                        # docs/MIGRATION.md "PixelSNAIL attention layout".
                        print(f"WARNING: {path} predates the r4 PixelSNAIL "
                              "attention-layout fix (no attn_out_layout "
                              "stamp); its out_proj weights were trained "
                              "against the heads-major flatten and will be "
                              "misinterpreted — retrain the prior or see "
                              "docs/MIGRATION.md")
                    merged = SimpleNamespace(**{**vars(vq_args), **p_args})
                    if "pixelsnail" in prior_dir:
                        merged.prior_type = "pixelsnail"
                    prior_model = build_prior(
                        merged, model.num_embeddings, hier_arch,
                        getattr(model, "embedding_dim", None))
                    print(f"Using prior checkpoint {path} for generation")
                    return {"model": prior_model,
                            "params": payload["model_state_dict"]["params"],
                            "hierarchical": hier_arch}
                except Exception as e:  # pragma: no cover
                    print(f"prior load failed ({path}): {e}")
            # reference torch prior checkpoints live at the same relative
            # paths with a .pth suffix (reference main.py:1039-1047) —
            # import them on the fly (utils/torch_import.py)
            torch_path = path + ".pth"
            if os.path.isfile(torch_path):
                try:
                    from movae_tpu.utils.torch_import import (
                        import_torch_state_dict, load_torch_state_dict,
                        prior_from_state)

                    state, _ = load_torch_state_dict(torch_path)
                    p_arch = (("hierarchical_" if hier_arch else "")
                              + ("pixelsnail" if "pixelsnail" in prior_dir
                                 else "pixelcnn"))
                    prior_model = prior_from_state(
                        state, p_arch,
                        num_heads=getattr(vq_args, "pixelsnail_num_heads",
                                          8) or 8)
                    p_params, _ = import_torch_state_dict(state, p_arch)
                    print(f"Using torch prior checkpoint {torch_path} "
                          "for generation")
                    return {"model": prior_model, "params": p_params,
                            "hierarchical": hier_arch}
                except Exception as e:  # pragma: no cover
                    print(f"torch prior load failed ({torch_path}): {e}")
    return None


def extract_codes(model, state, hierarchical: bool,
                  normalize_inputs: bool = False):
    """Jitted frozen-VQ code extraction sweep (vq_codes_lmdb.py:58-99).
    Accepts raw-uint8 loader batches (cast/normalize happens in-jit, see
    movae_tpu.train.step.preprocess_batch)."""
    from movae_tpu.train.step import preprocess_batch

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if hierarchical:
        fn = jax.jit(lambda x: model.apply(
            variables, preprocess_batch(x, normalize_inputs),
            method="get_code_indices_pair"))
    else:
        fn = jax.jit(lambda x: model.apply(
            variables, preprocess_batch(x, normalize_inputs),
            method="get_code_indices"))

    def extract(imgs):
        return fn(jnp.asarray(imgs))

    return extract


def train_prior(results: Dict[str, Any], args) -> Optional[Dict[str, Any]]:
    """Train the prior stage; returns {'model','params','hierarchical'}.

    The prior trains data-parallel over the same mesh as the VQ stage:
    code batches sharded on 'data', prior params replicated, grad psum
    inserted by GSPMD (the reference prior stage is single-device,
    main.py:890-1051). With ``--context_parallel N`` the mesh carries an
    N-way 'seq' axis and the PixelSNAIL attention runs ring
    (sequence-parallel) attention over it (ops/ring_attention.py) — the
    config is installed trace-time via movae_tpu.parallel.context. With
    ``--pipeline_parallel S`` the prior block stack(s) — PixelCNN,
    PixelSNAIL, or both levels of the hierarchical priors — are
    GPipe-pipelined over a 'pipe' axis instead (parallel/pipeline.py;
    exclusive with context/tensor parallelism).
    """
    import contextlib

    from movae_tpu.parallel.context import context_parallel

    parallel = results.get("parallel")
    if parallel is None:
        from movae_tpu.parallel.mesh import DataParallel, make_mesh
        cp_n = int(getattr(args, "context_parallel", 1) or 1)
        pp_n = int(getattr(args, "pipeline_parallel", 1) or 1)
        parallel = DataParallel(make_mesh(num_seq=cp_n, num_pipe=pp_n),
                                fsdp=bool(getattr(args, "fsdp", False)))
        results = dict(results, parallel=parallel)
    ctx = (context_parallel(parallel.mesh)
           if int(parallel.mesh.shape.get("seq", 1)) > 1
           else contextlib.nullcontext())
    with ctx:
        return _train_prior_impl(results, args)


def _train_prior_impl(results: Dict[str, Any], args
                      ) -> Optional[Dict[str, Any]]:
    model = results["model"]
    state = results["state"]
    save_root = results["save_root"]
    hierarchical = args.arch.lower() in ("vq_vae2", "gg_vq_vae2")

    epochs = getattr(args, "pixelcnn_epochs", 100)
    parallel = results["parallel"]
    batch_size = parallel.pad_to_devices(args.batch_size)
    lr = getattr(args, "pixelcnn_lr", 3e-4)

    if results.get("prior_levels") is not None:
        # pre-supplied frozen code levels (equivalence studies / code-set
        # reuse): skip the VQ extraction sweep entirely
        levels, cached = results["prior_levels"], False
    else:
        extract = extract_codes(
            model, state, hierarchical,
            normalize_inputs=results.get("normalize", False))
        # resumed runs point the cache at the interrupted run's save_root so
        # the prior continues on the SAME augmented code snapshot (a fresh
        # extraction would redraw the loader's random flips)
        cache_root = results.get("prior_cache_root") or save_root
        levels, cached = get_or_extract_codes(
            extract, results["train_loader"], cache_root, args.arch,
            args.dataset, model.num_embeddings, model.input_size,
            hierarchical,
            force_extract=getattr(args, "prior_force_extract_codes", False),
            use_cache=getattr(args, "prior_use_lmdb_codes", True))
    pc = jax.process_count()
    # multi-host: args.batch_size is the GLOBAL batch (as in run_training) —
    # each host loads its 1/pc slice; per-host code shards can differ by a
    # few samples, so force an identical per-host step count too, or the
    # cross-host grad psum deadlocks on a host that ran one extra batch
    local_bs = batch_size // pc if pc > 1 else batch_size
    if pc > 1:
        # lockstep per-host step count from the ACTUAL global code count (a
        # cross-host sum of local shard lengths) — args.dataset_size can be
        # a guessed echo on checkpoint-restored runs (load_vqvae
        # need_data=False path) and must not drive collective cadence
        from jax.experimental import multihost_utils
        local_n = len(levels["top" if hierarchical else "codes"])
        n_global = int(multihost_utils.process_allgather(
            np.asarray(local_n, np.int64)).sum())
        epoch_len = -(-n_global // pc)
    else:
        epoch_len = None
    loader = CodeLoader(levels, local_bs, shuffle=True,
                        seed=getattr(args, "seed", 0) or 0,
                        epoch_len=epoch_len)

    prior = build_prior(args, model.num_embeddings, hierarchical,
                        getattr(model, "embedding_dim", None))
    att_grid = levels["top" if hierarchical else "codes"]
    warn_long_seq_dropout(prior, att_grid.shape[1], att_grid.shape[2])

    # --- pipeline parallelism (--pipeline_parallel S) --------------------
    # GPipe microbatching over the mesh 'pipe' axis with the PixelSNAIL
    # block stack stage-sharded at rest (parallel/pipeline.py). Checkpoints
    # keep the reference-compatible unstacked params layout (the opt_state
    # payload stays in the live stacked layout; the resume graft skips it
    # gracefully if the pipeline config changed).
    pp_n = int(parallel.mesh.shape.get("pipe", 1))
    use_pp = pp_n > 1
    if use_pp:
        from movae_tpu.parallel import pipeline as pp_lib
        if getattr(parallel, "fsdp", False):
            print("[movae_tpu] note: --fsdp does not apply to the "
                  "pipelined prior — the block stack is stage-sharded "
                  "over 'pipe' (the bigger at-rest saving) and the "
                  "prologue/head params stay replicated", flush=True)
        per_shard = batch_size // int(parallel.mesh.shape["data"])
        pp_m = (int(getattr(args, "pipeline_microbatches", 0) or 0)
                or pp_lib.default_microbatches(per_shard, pp_n))
        if pp_m < pp_n:
            # GPipe utilization is M/(M+S-1): with M < S most of each tick
            # is bubble — surface it instead of silently training slow
            print(f"[movae_tpu] pipeline_parallel={pp_n} got only "
                  f"{pp_m} microbatch(es) from the per-shard batch "
                  f"{per_shard} (bubble {(pp_n - 1) / (pp_m + pp_n - 1):.0%});"
                  f" raise --batch_size or set --pipeline_microbatches",
                  flush=True)
        make_pp = (pp_lib.make_pipelined_hierarchical_loss if hierarchical
                   else pp_lib.make_pipelined_prior_loss)
        pp_loss = make_pp(prior, parallel.mesh, pp_m, train=True)

    def _place(p):
        """Device placement for live prior params: stacked + stage-sharded
        under pipeline parallelism; ZeRO-3 'data'-sharded under --fsdp
        (optimizer moments inherit via tx.init); replicated otherwise."""
        if use_pp:
            return pp_lib.shard_pp_params(
                pp_lib.stack_prior_params(prior, p), parallel.mesh)
        if getattr(parallel, "fsdp", False):
            return parallel.shard_params(p)
        return parallel.replicate(p)

    def _host_params(p):
        """Checkpoint/sampler layout: fetched to host, unstacked.
        host_copy all-gathers cross-host (fsdp/pipe) shards — a collective;
        every process must call this, writes stay process-0-gated."""
        p = parallel.host_copy(p)
        return pp_lib.unstack_prior_params(prior, p) if use_pp else p
    rng = jax.random.PRNGKey((getattr(args, "seed", 0) or 0) + 1)
    if hierarchical:
        zt = jnp.zeros((2,) + levels["top"].shape[1:], jnp.int32)
        zb = jnp.zeros((2,) + levels["bottom"].shape[1:], jnp.int32)
        params = prior.init({"params": rng, "dropout": rng}, zt, zb,
                            train=False)["params"]
    else:
        z = jnp.zeros((2,) + levels["codes"].shape[1:], jnp.int32)
        params = prior.init({"params": rng, "dropout": rng}, z,
                            train=False)["params"]

    # --grad_accum A: A code microbatches per optimizer update (same flag +
    # semantics as the VQ stage, train/step.py make_train_step grad_accum) —
    # the cosine horizon counts OPTIMIZER steps: fully-valid batches
    # accumulate in groups of A, leftover full batches and the ragged tail
    # run as independent single updates (dispatch_accum below)
    accum_k = int(getattr(args, "grad_accum", 1) or 1)
    n_batches = max(len(loader), 1)
    if pc > 1:
        n_full = min(n_batches, n_global // batch_size)
    else:
        n_full = min(n_batches, loader.n // local_bs)
    opt_steps_per_epoch = max(1, n_full // accum_k + n_full % accum_k
                              + (n_batches - n_full))
    # torch CosineAnnealingLR steps per EPOCH (reference main.py:955-957,
    # 1035: T_max=pixelcnn_epochs, eta_min=1e-6, scheduler.step() once per
    # epoch) — LR is constant within an epoch. Quantize the optimizer-step
    # counter to the epoch index so the LR trajectory matches the
    # reference exactly (r4: the earlier smooth per-step cosine agreed
    # only at epoch boundaries).
    ep_sched = optax.cosine_decay_schedule(lr, epochs, alpha=1e-6 / lr)

    def sched(count):
        return ep_sched(count // opt_steps_per_epoch)

    wd = getattr(args, "pixelcnn_weight_decay", 0.0) or 0.0
    # eps override for cross-framework lockstep studies (at torch/optax's
    # shared 1e-8 default, sub-fp-noise gradient elements take full +-lr
    # steps and independent implementations diverge by construction — see
    # tests/test_torch_lockstep.py)
    adam_eps = float(getattr(args, "pixelcnn_adam_eps", 1e-8) or 1e-8)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(sched, weight_decay=wd, eps=adam_eps) if wd
                     else optax.adam(sched, eps=adam_eps))
    params = _place(params)
    opt_state = tx.init(params)  # moments inherit the param layout

    # --- preemption tolerance + resume (mirrors the VQ loop) -------------
    # SIGTERM writes <save_root>/<type>_prior/checkpoints/last_prior and
    # exits 143; a retry resumes it via results["prior_resume"] (derived
    # from --resume by run_training) or --prior_resume (standalone
    # trainers). The optimizer state carries the cosine-schedule step, so
    # the LR continues where it left off.
    from movae_tpu.utils.preemption import PreemptionGuard
    guard = PreemptionGuard()
    stop_check = (lambda: guard.triggered) if pc == 1 else None
    prior_type = getattr(args, "prior_type", "pixelcnn")
    last_prior_path = os.path.join(
        os.path.dirname(ckpt_lib.best_prior_path(save_root, prior_type)),
        "last_prior")
    start_epoch = 1
    best_loss = float("inf")
    resume_src = (results.get("prior_resume")
                  or getattr(args, "prior_resume", None))
    if resume_src and os.path.exists(resume_src):
        payload = ckpt_lib.load_checkpoint(resume_src)
        rp = payload["model_state_dict"]["params"]
        params = _place(rp)
        if payload.get("opt_state"):
            leaves = jax.tree_util.tree_leaves(payload["opt_state"])
            treedef = jax.tree_util.tree_structure(opt_state)
            if treedef.num_leaves == len(leaves):
                # graft onto the LIVE placement (stage-sharded moments under
                # pipeline parallelism, replicated otherwise; scalar optax
                # leaves report SingleDeviceSharding — replicate those, or
                # the commit would clash with mesh-placed params in jit)
                from movae_tpu.train.loop import _mesh_shardings
                opt_state = jax.device_put(
                    jax.tree_util.tree_unflatten(
                        treedef, [jnp.asarray(l) for l in leaves]),
                    _mesh_shardings(opt_state, parallel.replicated))
        start_epoch = int(payload.get("epoch") or 0) + 1
        best_loss = float(payload.get("best_loss", float("inf")))
        print(f"Resumed prior from {resume_src} at epoch {start_epoch}")

    def _save_last_prior(epoch_done: int, loss: float) -> None:
        # the host fetches are collectives under multi-host sharded
        # layouts — every process runs them; only process 0 writes
        payload = {
            "epoch": epoch_done,
            "model_state_dict": {"params": _host_params(params)},
            "opt_state": parallel.host_copy(opt_state),
            "loss": loss, "best_loss": best_loss,
            "prior_args": prior_args_echo(args, prior.embedding_dim)}
        if is_main:
            ckpt_lib.save_checkpoint(last_prior_path, payload)

    def _grads(params, batch, rng):
        def loss_fn(p):
            if use_pp:
                out = (pp_loss(p, batch["top"], batch["bottom"], rng)
                       if hierarchical else pp_loss(p, batch["codes"], rng))
            elif hierarchical:
                out = prior.apply({"params": p}, batch["top"],
                                  batch["bottom"], train=True,
                                  method="loss_function",
                                  rngs={"dropout": rng})
            else:
                out = prior.apply({"params": p}, batch["codes"], train=True,
                                  method="loss_function",
                                  rngs={"dropout": rng})
            return out["total_loss"], out

        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return grads, out

    def _step(params, opt_state, batch, rng):
        grads, out = _grads(params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, out

    # donate params+opt_state: the caller rebinds both every call, so XLA
    # can update in place instead of holding two copies live through the
    # optimizer step (matters for fsdp-scale priors; same policy as the
    # VQ-stage step, train/loop.py)
    step = jax.jit(_step, donate_argnums=(0, 1))
    # code batches are tiny (int grids), so prior training is dispatch-
    # latency bound like small-image training: fuse k steps per dispatch
    # (same flag + mechanics as the VQ stage, train/step.py
    # make_scanned_train_step)
    scan_k = int(getattr(args, "steps_per_dispatch", 1) or 1)
    if accum_k > 1 and scan_k > 1:
        # (also raised by run_training for the VQ stage; the standalone
        # prior trainers reach here directly)
        raise ValueError(
            "--grad_accum and --steps_per_dispatch are mutually exclusive "
            "(an accumulation group is already one dispatch)")
    if accum_k > 1:
        _inv = 1.0 / accum_k

        def _accum(params, opt_state, batches, rng):
            keys = jax.random.split(rng, accum_k)
            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)

            def body(acc, xs):
                b, kk = xs
                grads, out = _grads(params, b, kk)
                acc = jax.tree_util.tree_map(
                    lambda a, g: a + _inv * g.astype(a.dtype), acc, grads)
                return acc, out

            acc, outs = jax.lax.scan(body, zeros, (batches, keys))
            updates, opt_state = tx.update(acc, opt_state, params)
            params = optax.apply_updates(params, updates)
            out = jax.tree_util.tree_map(lambda v: jnp.mean(v, axis=0), outs)
            return params, opt_state, out

        accum_step = jax.jit(_accum, donate_argnums=(0, 1))
    if scan_k > 1:
        def _scan(params, opt_state, batches, rng):
            keys = jax.random.split(rng, scan_k)

            def body(carry, xs):
                p, o = carry
                b, kk = xs
                p, o, out = _step(p, o, b, kk)
                return (p, o), out

            (params, opt_state), outs = jax.lax.scan(
                body, (params, opt_state), (batches, keys))
            return params, opt_state, outs

        scan_step = jax.jit(_scan, donate_argnums=(0, 1))

    logger = results.get("logger")
    # multi-host: only process 0 writes prior checkpoints/figures (the
    # loss is identical on every process — metrics come out of the psum'd
    # step — so gating IO loses nothing); concurrent saves to a shared
    # directory would race
    is_main = jax.process_index() == 0
    best_params = _host_params(params)
    meter = AverageMeter()  # pre-bound so --pixelcnn_epochs 0 still
    meter.update(float("nan"))  # writes a (loss-less) final checkpoint
    if pc == 1:
        n_global = int(getattr(args, "dataset_size", 0) or 0)
    # (pc > 1: n_global stays the allgathered global code count computed
    # above — args.dataset_size can be a guessed echo on checkpoint-restored
    # runs and must not drive the host-invariant tail weights)
    step_trace = results.get("prior_step_trace")  # per-step CE capture
    for epoch in range(start_epoch, epochs + 1):
        meter = AverageMeter()
        pending = []  # delayed host fetches (overlap device compute)
        scan_buf = []
        accum_buf = []

        def flush():
            for out, ws in pending:
                tl = np.asarray(jax.device_get(out["total_loss"]))
                for loss, w in zip(np.atleast_1d(tl), ws):
                    meter.update(float(loss), n=w)
                    if step_trace is not None:
                        step_trace.append(float(loss))
            pending.clear()

        def dispatch_buf(force=False):
            nonlocal params, opt_state, rng
            if len(scan_buf) == scan_k:
                stacked = {k: parallel.shard_batch_stacked(
                    np.stack([b[k] for b, _ in scan_buf]))
                    for k in scan_buf[0][0]}
                rng, sub = jax.random.split(rng)
                params, opt_state, outs = scan_step(params, opt_state,
                                                    stacked, sub)
                pending.append((outs, [w for _, w in scan_buf]))
                scan_buf.clear()
            elif force:
                for b, w in scan_buf:
                    batch = {k: parallel.shard_batch(v) for k, v in b.items()}
                    rng, sub = jax.random.split(rng)
                    p, o, out = step(params, opt_state, batch, sub)
                    params, opt_state = p, o
                    pending.append((out, [w]))
                scan_buf.clear()

        def dispatch_accum(force=False):
            # A fully-valid microbatches -> ONE optimizer update; the
            # scanned out dict is the microbatch MEAN, weighted by the
            # group's total images (exact: only equal-weight full batches
            # are buffered; ragged batches run as independent single steps)
            nonlocal params, opt_state, rng
            if len(accum_buf) == accum_k:
                stacked = {k: parallel.shard_batch_stacked(
                    np.stack([b[k] for b, _ in accum_buf]))
                    for k in accum_buf[0][0]}
                rng, sub = jax.random.split(rng)
                params, opt_state, out = accum_step(params, opt_state,
                                                    stacked, sub)
                pending.append((out, [sum(w for _, w in accum_buf)]))
                accum_buf.clear()
            elif force:
                for b, w in accum_buf:
                    batch = {k: parallel.shard_batch(v) for k, v in b.items()}
                    rng, sub = jax.random.split(rng)
                    p, o, out = step(params, opt_state, batch, sub)
                    params, opt_state = p, o
                    pending.append((out, [w]))
                accum_buf.clear()

        for bi, (batch_np, n_valid) in enumerate(loader):
            if pc > 1 and n_global:
                # host-INVARIANT weight from the global counts: per-host
                # n_valid differs with shard sizes, which would make
                # meter.avg (and the best-checkpoint choice) diverge
                # across hosts even though the psum'd loss is identical
                w = max(1, min(batch_size, n_global - bi * batch_size)) / pc
            else:
                w = n_valid
            if accum_k > 1 and w == local_bs:
                # only fully-valid batches join an accumulation group (w is
                # host-invariant: derived from global counts under
                # multi-host); the ragged tail takes the single-step path
                # in dispatch_accum(force=True) at epoch end
                accum_buf.append((batch_np, w))
                dispatch_accum()
            elif accum_k > 1:
                # ragged batch mid-stream: flush the group, run it singly
                dispatch_accum(force=True)
                batch = {k: parallel.shard_batch(v)
                         for k, v in batch_np.items()}
                rng, sub = jax.random.split(rng)
                params, opt_state, out = step(params, opt_state, batch, sub)
                pending.append((out, [w]))
            elif scan_k > 1:
                scan_buf.append((batch_np, w))
                dispatch_buf()
            else:
                batch = {k: parallel.shard_batch(v)
                         for k, v in batch_np.items()}
                rng, sub = jax.random.split(rng)
                params, opt_state, out = step(params, opt_state, batch, sub)
                pending.append((out, [w]))
            if len(pending) >= 8:
                flush()
            if stop_check is not None and stop_check():
                break
        dispatch_accum(force=True)
        dispatch_buf(force=True)
        flush()
        if guard.globally_triggered():
            _save_last_prior(epoch - 1, meter.avg)  # write gated inside
            guard.uninstall()
            print(f"[movae_tpu] preempted during prior epoch {epoch}: "
                  f"wrote resumable checkpoint ({last_prior_path}); "
                  f"exiting 143. Continue with --resume (main.py) or "
                  f"--prior_resume {last_prior_path}", flush=True)
            sys.exit(143)
        if logger is not None and logger.active:
            logger.log({"prior/loss": meter.avg, "prior/epoch": epoch})
        if meter.avg < best_loss:
            best_loss = meter.avg
            best_params = _host_params(params)
            if is_main:
                ckpt_lib.save_checkpoint(ckpt_lib.best_prior_path(
                    save_root, getattr(args, "prior_type", "pixelcnn")), {
                    "epoch": epoch,
                    "model_state_dict": {"params": best_params},
                    "loss": best_loss,
                    "prior_args": prior_args_echo(args, prior.embedding_dim)})
        # per-epoch crash tolerance (params are small; the VQ stage saves
        # per save_freq, priors save every epoch); write gated inside
        _save_last_prior(epoch, meter.avg)
        if epoch % 10 == 0 or epoch == epochs:
            print(f"prior epoch {epoch}/{epochs}: CE={meter.avg:.4f} "
                  f"(best {best_loss:.4f})")
        sample_every = getattr(args, "prior_sample_every", 0) or 0
        if sample_every and (epoch % sample_every == 0 or epoch == epochs):
            # periodic sample grid through the current prior (reference
            # train_prior_vqvae.py --sample_every). EVERY process runs the
            # generation — the VQ decode goes through global-mesh params,
            # and a lone process entering that computation would hang the
            # others — but only process 0 writes the figure.
            try:
                from movae_tpu.train import figures as fig_lib
                from movae_tpu.train.final_metrics import generate_samples

                cur = {"model": prior, "params": _host_params(params),
                       "hierarchical": hierarchical}
                n = min(getattr(args, "num_samples", 16), 16)
                imgs = generate_samples(model, state, args, cur, rng, n,
                                        batch=n)
                if is_main:
                    fig_lib.save_sample_grid(imgs, os.path.join(
                        save_root, "figures", "generated",
                        f"prior_epoch_{epoch:04d}.pdf"),
                        getattr(args, "normalize_inputs", False))
            except Exception as e:  # pragma: no cover
                print(f"prior sample figure failed: {e}")

    guard.uninstall()
    final_hp = _host_params(params)  # collective — before the p0 gate
    if is_main:
        ckpt_lib.save_checkpoint(ckpt_lib.final_prior_path(
            save_root, getattr(args, "prior_type", "pixelcnn")), {
            "epoch": epochs,
            "model_state_dict": {"params": final_hp},
            "loss": meter.avg,
            "prior_args": prior_args_echo(args, prior.embedding_dim)})
    return {"model": prior, "params": best_params,
            "hierarchical": hierarchical}
