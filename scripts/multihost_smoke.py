"""Two-process jax.distributed (DCN) smoke for the multi-host code paths.

The reference framework is single-process (SURVEY.md §2.5); our multi-host
support — Loader interleaved input sharding, global batch assembly via
``jax.make_array_from_process_local_data``, process-0 IO gating, and the
codes-cache hit/miss lockstep — is logic-implemented but this environment
has no multi-host hardware.  This smoke ACTUALLY runs it: the launcher
spawns two worker processes on localhost (CPU backend, 4 virtual devices
each, gloo collectives) that form one 8-device global mesh and exercise:

  1. sharded Loader -> global batch assembly (shape + content check),
  2. a jitted multi-objective (upgrad) train step over the global mesh,
     two steps, losses finite and bitwise-identical across hosts,
  3. process-0 IO gating (only host 0 writes),
  4. get_or_extract_codes lockstep when only ONE host has a warm cache
     (the ADVICE-r1 partial-cache deadlock scenario): all hosts must
     agree to extract, and both must return identical code sets,
  5. ring (sequence-parallel) attention ACROSS the process boundary: a
     PixelSNAIL loss with the zigzag ring's ppermute ring spanning both
     hosts (4-way 'seq' axis over the 2x4-device global mesh) must match
     the single-trace dense-attention loss bitwise-closely and agree
     across hosts,
  6. GPipe pipeline parallelism ACROSS the process boundary: a 2-stage
     pipelined PixelSNAIL loss whose stage-to-stage ppermute hop crosses
     the two hosts (each 'pipe' pair holds one device per host) must
     match the plain single-trace loss and agree across hosts,
  7. host_copy of cross-host fsdp-sharded params (checkpoint fetch path),
  8. sample-parallel prior sampling over the cross-host mesh: the
     batch-sharded KV-cache sampler's draws must be bitwise identical to
     the unsharded sampler, a ragged batch must no-op safely, and
     final_metrics._gather_chunk must fetch the cross-host-sharded
     result on every process,
  9. a full cross-host FSDP OPTIMIZER step: params + SGD-momentum state
     ZeRO-3-sharded over the 'data' axis spanning both hosts, two
     multi-objective updates, post-step params must match the
     replicated-placement run of the same steps and agree across hosts,
  10. a full cross-host PIPELINE optimizer step: grads of the 2-stage
     GPipe loss (stage hand-off crossing gloo) -> SGD update on the
     stage-sharded stacked params, post-step params must match the plain
     single-trace grad+update and agree across hosts.

Run: python scripts/multihost_smoke.py            (launcher)
Exit code 0 = all workers passed.
"""

import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# MOVAE_SMOKE_PROCS=4 MOVAE_SMOKE_DEVS=2 runs the 4-process configuration
# (r5; every arm is written in terms of these, so the 8-device global mesh
# splits 2x4 or 4x2 — workers inherit the env through the launcher)
NUM_PROCS = int(os.environ.get("MOVAE_SMOKE_PROCS", "2"))
DEVICES_PER_PROC = int(os.environ.get("MOVAE_SMOKE_DEVS", "4"))


def launcher() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    workdir = tempfile.mkdtemp(prefix="movae_mh_smoke_")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # axon sitecustomize TPU pin
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROC}")
    env["XLA_FLAGS"] = " ".join(flags)
    sys.path.insert(0, REPO)
    from movae_tpu.utils.hostfp import fingerprinted_cache_dir

    # host-CPU-fingerprinted: cross-host CPU AOT entries SIGILL (hostfp.py)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   fingerprinted_cache_dir("/tmp/jax_cache"))
    # the worker runs by absolute script path, so sys.path gets scripts/,
    # not the repo root — put the package on PYTHONPATH explicitly
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(pid), str(port), workdir],
            cwd=REPO, env=env)
        for pid in range(NUM_PROCS)
    ]
    rc = 0
    for p in procs:
        rc |= p.wait()
    print("multihost smoke:", "PASS" if rc == 0 else f"FAIL (rc={rc})")
    return rc


def worker(pid: int, port: int, workdir: str) -> None:
    import jax
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=NUM_PROCS, process_id=pid)
    import jax.numpy as jnp
    import numpy as np

    from movae_tpu.data import Loader, get_dataset
    from movae_tpu.models import get_network, init_model
    from movae_tpu.moo import AggregatorConfig, init_state
    from movae_tpu.parallel.mesh import DataParallel
    from movae_tpu.train.optim import build_optimizer, lr_schedule
    from movae_tpu.train.state import TrainState
    from movae_tpu.train.step import make_train_step

    assert jax.process_count() == NUM_PROCS
    assert jax.device_count() == NUM_PROCS * DEVICES_PER_PROC
    parallel = DataParallel()
    tag = f"[p{pid}]"

    # -- 1. sharded input pipeline -> global batch assembly ----------------
    train_ds, _test_ds, input_size = get_dataset("synthetic-16-64", None,
                                                 False)
    local_bs = 8  # global batch 16 over 8 devices
    loader = Loader(train_ds, local_bs, shuffle=True, seed=3,
                    process_index=pid, process_count=NUM_PROCS)
    imgs, _labels, n_valid = next(iter(loader))
    batch = parallel.shard_batch(imgs)
    assert batch.shape[0] == local_bs * NUM_PROCS, batch.shape
    # global content equals the union of the interleaved host slices: the
    # full gather must hold every host's local rows
    gathered = np.asarray(
        jax.jit(lambda b: b, out_shardings=parallel.replicated)(batch))
    local_np = np.asarray(imgs)
    for row in local_np:
        assert (np.abs(gathered - row).reshape(gathered.shape[0], -1)
                .max(axis=1) < 1e-6).any(), "local row missing from global"
    print(f"{tag} loader/global-batch assembly ok", flush=True)

    # -- 2. multi-objective train step over the global mesh ----------------
    margs = dict(arch="vae", latent_dim=8, hidden_dims=(8, 16),
                 batch_size=local_bs * NUM_PROCS, dataset_size=64)
    model = get_network(input_size, 3, margs)
    params, bstats = init_model(model, jax.random.PRNGKey(0), input_size, 3,
                                batch_size=2)
    cfg = AggregatorConfig(name="upgrad",
                           num_objectives=len(model.objective_names))
    tx = build_optimizer("adam", lr_schedule(1e-3, None, 1, 1))
    state = parallel.replicate(
        TrainState.create(model.apply, params, bstats, tx, init_state(cfg)))
    step_fn = jax.jit(make_train_step(model, cfg, 1, 1))
    rng = parallel.replicate(jax.random.PRNGKey(5))
    with parallel.mesh:
        for _ in range(2):
            state, metrics = step_fn(state, batch, rng)
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss)
    from jax.experimental import multihost_utils
    losses = np.asarray(
        multihost_utils.process_allgather(np.float64(loss)))
    assert (losses == losses[0]).all(), f"host losses diverged: {losses}"
    print(f"{tag} train step lockstep ok (loss={loss:.6f})", flush=True)

    # -- 3. process-0 IO gating --------------------------------------------
    is_main = jax.process_index() == 0
    marker = os.path.join(workdir, f"io_{pid}.txt")
    if is_main:  # the same gate train/loop.py uses for figures/checkpoints
        with open(marker, "w") as f:
            f.write("main\n")
    multihost_utils.sync_global_devices("io_gate")
    assert os.path.exists(os.path.join(workdir, "io_0.txt"))
    assert not os.path.exists(os.path.join(workdir, "io_1.txt"))
    print(f"{tag} process-0 IO gating ok", flush=True)

    # -- 4. codes-cache lockstep with a PARTIAL cache ----------------------
    from movae_tpu.utils.codes_cache import CodeCache, cache_key, \
        get_or_extract_codes
    save_root = os.path.join(workdir, f"host{pid}")  # per-host cache roots
    key = cache_key("vq_vae", "synthetic-16-64", 32, 16)
    if pid == 0:
        # pre-warm ONLY host 0's cache (stale values, to prove re-extract)
        stale = CodeCache(os.path.join(save_root, "codes_cache", key))
        stale.write({"codes": np.full((4, 2, 2), 7, np.int32)}, {})

    def extract_fn(images):
        return jnp.zeros((np.asarray(images).shape[0], 2, 2), jnp.int32)

    code_loader = Loader(train_ds, local_bs, shuffle=False, raw=True,
                         process_index=pid, process_count=NUM_PROCS)
    levels, cached = get_or_extract_codes(
        extract_fn, code_loader, save_root, "vq_vae", "synthetic-16-64",
        32, 16, is_hierarchical=False)
    assert not cached, "partial cache must force ALL hosts to extract"
    assert (np.asarray(levels["codes"]) == 0).all(), "stale cache served"
    print(f"{tag} codes-cache partial-hit lockstep ok", flush=True)

    # -- 5. ring attention across the process boundary ----------------------
    from movae_tpu.models.pixelcnn import PixelSNAIL
    from movae_tpu.parallel.context import context_parallel
    from movae_tpu.parallel.mesh import make_mesh

    prior = PixelSNAIL(num_embeddings=16, embedding_dim=8,
                       hidden_channels=16, num_blocks=1,
                       num_res_blocks_per_layer=1, num_heads=2, dropout=0.0)
    prng = jax.random.PRNGKey(11)
    z_np = np.asarray(jax.random.randint(prng, (2, 8, 8), 0, 16))
    pparams = prior.init({"params": prng, "dropout": prng},
                         jnp.asarray(z_np), train=False)["params"]

    def prior_loss(p, z):
        return prior.apply({"params": p}, z, train=True,
                           method="loss_function",
                           rngs={"dropout": prng})["total_loss"]

    # interleave the two processes' devices so every 4-device 'seq' ring
    # contains devices from BOTH hosts (default id order would keep each
    # ring intra-process and never test the cross-host ppermute hop)
    devs = sorted(jax.devices(), key=lambda d: d.id)
    order = [devs[i + DEVICES_PER_PROC * p]
             for i in range(DEVICES_PER_PROC) for p in range(NUM_PROCS)]
    cp_mesh = make_mesh(num_data=2, num_model=1, num_seq=4, devices=order)
    pparams_r = parallel.replicate(pparams)
    z_r = parallel.replicate(jnp.asarray(z_np))
    dense = float(jax.jit(prior_loss)(pparams_r, z_r))
    with context_parallel(cp_mesh):
        # seq axis spans both processes: the zigzag ring's ppermute hops
        # cross the gloo (DCN-analog) boundary every step
        ring = float(jax.jit(prior_loss)(pparams_r, z_r))
    assert np.isfinite(ring)
    assert abs(ring - dense) <= 1e-5 * max(1.0, abs(dense)), (ring, dense)
    rings = np.asarray(multihost_utils.process_allgather(np.float64(ring)))
    assert (rings == rings[0]).all(), f"ring losses diverged: {rings}"
    print(f"{tag} cross-host ring attention ok "
          f"(ring={ring:.6f} dense={dense:.6f})", flush=True)

    # -- 6. GPipe pipeline across the process boundary ----------------------
    from movae_tpu.parallel.pipeline import (
        make_pipelined_prior_loss,
        pp_param_shardings,
        stack_block_params,
    )

    prior2 = PixelSNAIL(num_embeddings=16, embedding_dim=8,
                        hidden_channels=16, num_blocks=2,
                        num_res_blocks_per_layer=1, num_heads=2, dropout=0.0)
    z2_np = np.asarray(jax.random.randint(jax.random.PRNGKey(12),
                                          (8, 4, 4), 0, 16))
    p2 = prior2.init({"params": prng, "dropout": prng},
                     jnp.asarray(z2_np[:2]), train=False)["params"]

    def prior2_loss(p, z):
        return prior2.apply({"params": p}, z, train=True,
                            method="loss_function",
                            rngs={"dropout": prng})["total_loss"]

    plain = float(jax.jit(prior2_loss)(parallel.replicate(p2),
                                       parallel.replicate(jnp.asarray(z2_np))))
    # the interleaved device order makes every (data-row) 'pipe' pair hold
    # one device from EACH host: the stage hand-off ppermute crosses gloo
    pp_mesh = make_mesh(num_data=4, num_model=1, num_seq=1, num_pipe=2,
                        devices=order)
    pp_loss = make_pipelined_prior_loss(prior2, pp_mesh, num_microbatches=2,
                                        train=True)

    def to_global(x, sharding):
        # robust multi-process global-array creation from an identical
        # host value on every process
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: np.asarray(x)[idx])

    stacked = stack_block_params(p2)
    shardings = pp_param_shardings(stacked, pp_mesh)
    stacked_g = jax.tree_util.tree_map(to_global, stacked, shardings)
    from jax.sharding import NamedSharding, PartitionSpec as PSpec
    z2_g = to_global(z2_np, NamedSharding(pp_mesh, PSpec("data")))
    with pp_mesh:
        piped = float(jax.jit(
            lambda p, z: pp_loss(p, z, jax.random.PRNGKey(13))["total_loss"]
        )(stacked_g, z2_g))
    assert np.isfinite(piped)
    assert abs(piped - plain) <= 1e-5 * max(1.0, abs(plain)), (piped, plain)
    pipes = np.asarray(multihost_utils.process_allgather(np.float64(piped)))
    assert (pipes == pipes[0]).all(), f"pipeline losses diverged: {pipes}"
    print(f"{tag} cross-host pipeline parallelism ok "
          f"(piped={piped:.6f} plain={plain:.6f})", flush=True)

    # -- 7. host_copy of cross-host-sharded params (fsdp checkpoint path) ---
    # a bare device_get on a 'data'-sharded leaf raises for non-addressable
    # devices; DataParallel.host_copy must all-gather first on EVERY process
    fsdp_par = DataParallel(parallel.mesh, fsdp=True)
    w = np.arange(64, dtype=np.float32).reshape(8, 8)
    w_sh = fsdp_par.param_shardings({"w": w}, min_elems=0)["w"]
    assert "data" in str(w_sh.spec), w_sh
    w_g = jax.make_array_from_callback(w.shape, w_sh,
                                       lambda idx: w[idx])
    fetched = fsdp_par.host_copy({"w": w_g})
    assert (np.asarray(fetched["w"]) == w).all()
    print(f"{tag} cross-host fsdp host_copy ok", flush=True)

    # -- 8. sample-parallel prior sampling across the process boundary ------
    # the 'data' axis of the default mesh spans both hosts, so the
    # batch-sharded sampler caches live on non-addressable devices and
    # _gather_chunk's replicate-reshard is a cross-process collective
    from movae_tpu.models.pixelcnn import sample_prior
    from movae_tpu.parallel.context import sample_parallel
    from movae_tpu.train.final_metrics import _gather_chunk

    skey = jax.random.PRNGKey(23)
    ref8 = np.asarray(sample_prior(prior, pparams, skey, 8, 4, 4))
    ref2 = np.asarray(sample_prior(prior, pparams, skey, 2, 4, 4))
    with sample_parallel(parallel.mesh):
        got8 = _gather_chunk(sample_prior(prior, pparams_r, skey, 8, 4, 4))
        # ragged batch (2 % 8 != 0): shard_sample_batch must no-op and the
        # gather must still work
        got2 = _gather_chunk(sample_prior(prior, pparams_r, skey, 2, 4, 4))
    assert (got8 == ref8).all(), "sharded draws != unsharded draws"
    assert (got2 == ref2).all(), "ragged-chunk draws != unsharded draws"
    sums = np.asarray(multihost_utils.process_allgather(
        np.float64(got8.sum())))
    assert (sums == sums[0]).all(), f"sample draws diverged: {sums}"
    print(f"{tag} cross-host sample-parallel sampling ok", flush=True)

    # -- 9. cross-host FSDP optimizer step (sharded momentum) ---------------
    # params + optimizer state ZeRO-3-placed over the 8-device 'data' axis
    # (4 devices per host): the grad reduce-scatters, the sharded SGD
    # update, and the param all-gathers all cross the gloo boundary.
    # SGD (linear in g) keeps the fsdp-vs-replicated delta at the fp noise
    # of the different reduction orders; adam at any eps would square it
    # through m-hat/v-hat (tests/test_torch_lockstep.py mechanism).
    margs2 = dict(arch="vq_vae", embedding_dim=8, num_embeddings=32,
                  hidden_dims=(8, 16), num_residual_layers=1,
                  batch_size=local_bs * NUM_PROCS, dataset_size=64)
    model2 = get_network(input_size, 3, margs2)
    p0, bst0 = init_model(model2, jax.random.PRNGKey(1), input_size, 3,
                          batch_size=2)
    cfg2 = AggregatorConfig(name="upgrad",
                            num_objectives=len(model2.objective_names))

    def run_two_steps(par):
        tx2 = build_optimizer("sgd", 1e-2)
        pr = (par.shard_params(p0, min_elems=0) if par.fsdp
              else par.replicate(p0))
        st = TrainState.create(model2.apply, pr, par.replicate(bst0), tx2,
                               init_state(cfg2))
        sfn = jax.jit(make_train_step(model2, cfg2, 1, 1))
        with par.mesh:
            for _ in range(2):
                st, m = sfn(st, batch, rng)
        return par.host_copy(st.params), float(m["total_loss"])

    fsdp_params, fsdp_loss = run_two_steps(
        DataParallel(parallel.mesh, fsdp=True))
    repl_params, repl_loss = run_two_steps(parallel)
    flat_f = jax.tree_util.tree_leaves(fsdp_params)
    flat_r = jax.tree_util.tree_leaves(repl_params)
    d = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
            for a, b in zip(flat_f, flat_r))
    assert d < 1e-5, f"fsdp post-step params diverged from replicated: {d}"
    csum = np.float64(sum(float(np.sum(np.asarray(a))) for a in flat_f))
    csums = np.asarray(multihost_utils.process_allgather(csum))
    assert (csums == csums[0]).all(), f"fsdp params diverged across: {csums}"
    print(f"{tag} cross-host fsdp optimizer step ok (delta={d:.2e}, "
          f"loss fsdp={fsdp_loss:.6f} repl={repl_loss:.6f})", flush=True)

    # -- 10. cross-host PIPELINE optimizer step ------------------------------
    import optax
    from jax.sharding import PartitionSpec as PSpec2

    tx3 = optax.sgd(1e-2)

    def fetch_tree(tree, mesh):
        rep = jax.jit(lambda t: t, out_shardings=jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, PSpec2()), tree))(tree)
        return jax.tree_util.tree_map(lambda x: np.asarray(x), rep)

    with pp_mesh:
        pp_step = jax.jit(lambda p, z: _sgd_update(
            tx3, p, jax.grad(lambda q: pp_loss(
                q, z, jax.random.PRNGKey(13))["total_loss"])(p)))
        new_stacked = pp_step(stacked_g, z2_g)
        new_stacked_h = fetch_tree(new_stacked, pp_mesh)
    plain_grads = jax.jit(jax.grad(prior2_loss))(
        parallel.replicate(p2), parallel.replicate(jnp.asarray(z2_np)))
    plain_new = _sgd_update(tx3, stack_block_params(p2),
                            stack_block_params(jax.device_get(plain_grads)))
    flat_p = jax.tree_util.tree_leaves(jax.device_get(plain_new))
    flat_s = jax.tree_util.tree_leaves(new_stacked_h)
    d2 = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(flat_s, flat_p))
    assert d2 < 1e-5, f"pipelined post-step params diverged: {d2}"
    csum2 = np.float64(sum(float(np.sum(a)) for a in flat_s))
    csums2 = np.asarray(multihost_utils.process_allgather(csum2))
    assert (csums2 == csums2[0]).all(), f"pipe params diverged: {csums2}"
    print(f"{tag} cross-host pipeline optimizer step ok (delta={d2:.2e})",
          flush=True)
    multihost_utils.sync_global_devices("done")


def _sgd_update(tx, params, grads):
    import jax
    import optax

    updates, _ = tx.update(grads, tx.init(params), params)
    return optax.apply_updates(params, updates)


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    else:
        sys.exit(launcher())
