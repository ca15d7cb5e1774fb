"""CLI wiring: flag parsing (aliases, JSON-or-list values) and the runner's
YAML->argv conversion — the surfaces the reference's 1,498 generated YAML
configs rely on (reference main.py:1500-1670 argparse; runner.py:32-85).

These are pure-parsing tests (no training), so they are cheap and lock the
flag-compatibility contract the configs tree depends on.
"""

import importlib
import os
import subprocess
import sys

import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

main_mod = importlib.import_module("main")
runner_mod = importlib.import_module("runner")


def test_parse_args_defaults():
    args = main_mod.parse_args([])
    assert args.dataset == "CIFAR10"
    assert args.batch_size == 128
    assert args.epochs == 50
    assert args.aggregator is None
    assert args.loss_weights is None


def test_parse_args_aliases():
    # reference spellings --agg / dashed variants (main.py:1513-1530)
    args = main_mod.parse_args(["--agg", "upgrad", "--norm-eps", "1e-3",
                                "--mgda-epsilon", "1e-4"])
    assert args.aggregator == "upgrad"
    assert args.agg_norm_eps == pytest.approx(1e-3)
    assert args.mgda_epsilon == pytest.approx(1e-4)


def test_parse_json_or_list():
    # JSON dict string form (reference main.py:1654-1667)
    args = main_mod.parse_args(
        ["--loss_weights", '{"reconstruction_loss": 1.0, "kld_loss": 0.5}'])
    assert args.loss_weights == {"reconstruction_loss": 1.0, "kld_loss": 0.5}
    # float list form
    args = main_mod.parse_args(["--hv_ref", "1.1", "1.1", "1.1"])
    assert args.hv_ref == [1.1, 1.1, 1.1]
    args = main_mod.parse_args([])
    assert args.pref_weights is None


def test_parse_hidden_dims_list():
    args = main_mod.parse_args(["--hidden_dims", "32", "64", "128"])
    assert list(args.hidden_dims) == [32, 64, 128]


def test_yaml_to_args_alias_map(tmp_path):
    """The reference YAML schema IS the flag schema, with the runner alias
    map agg->aggregator, wd->weight_decay, normalize->normalize_inputs,
    num_samples->num_vis_samples (runner.py:32-85)."""
    cfg = {
        "dataset": "cifar100",
        "arch": "vq_vae",
        "agg": "upgrad",
        "wd": 0.0001,
        "normalize": True,
        "num_samples": 8,
        "hidden_dims": [128, 256],
        "loss_weights": {"reconstruction_loss": 1.0},
        "skip_pixelcnn": False,
        "scheduler": None,
    }
    argv = runner_mod.yaml_to_args(cfg)
    joined = " ".join(argv)
    assert "--aggregator upgrad" in joined
    assert "--weight_decay 0.0001" in joined
    assert "--normalize_inputs" in joined          # True bool -> bare flag
    assert "--skip_pixelcnn" not in joined         # False bool -> omitted
    assert "--scheduler" not in joined             # None -> omitted
    assert "--num_vis_samples 8" in joined
    assert "--hidden_dims 128 256" in joined
    assert '--loss_weights {"reconstruction_loss": 1.0}' in joined

    # and the produced argv round-trips through the real parser
    args = main_mod.parse_args(argv)
    assert args.aggregator == "upgrad"
    assert args.normalize_inputs is True
    assert list(args.hidden_dims) == [128, 256]
    assert args.loss_weights == {"reconstruction_loss": 1.0}


def test_generated_configs_parse():
    """Every YAML the generator emits must convert to argv that the main
    parser accepts (the reference ships 1,498 of these; we spot-check the
    checked-in cifar100 tree)."""
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "cifar100")
    assert os.path.isdir(root)
    checked = 0
    for dirpath, _dirs, files in os.walk(root):
        for f in sorted(files):
            if not f.endswith(".yaml") or checked >= 40:
                continue
            with open(os.path.join(dirpath, f)) as fh:
                cfg = yaml.safe_load(fh)
            argv = runner_mod.yaml_to_args(cfg)
            args = main_mod.parse_args(argv)
            assert args.dataset
            assert args.arch
            checked += 1
    assert checked >= 20


def test_runner_file_list_collects_failures(tmp_path):
    """runner.py --file-list runs each config and exits nonzero when any
    fail (reference runner.py:205-222). Exercised with a config that points
    at a nonexistent dataset so the child exits fast."""
    cfg = {"dataset": "definitely-not-a-dataset", "arch": "vae",
           "epochs": 1, "batch_size": 4}
    cfg_path = tmp_path / "bad.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    lst = tmp_path / "list.txt"
    lst.write_text(str(cfg_path) + "\n")
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
    proc = subprocess.run(
        [sys.executable, "runner.py", "--file-list", str(lst)],
        cwd=os.path.dirname(os.path.abspath(runner_mod.__file__)),
        env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode != 0
    assert "fail" in (proc.stdout + proc.stderr).lower()


def test_prior_trainer_saved_args_precedence():
    """Standalone prior trainer merge: explicitly-typed CLI flags beat
    checkpoint-saved args, which beat argparse defaults — untouched defaults
    (prior_type, hidden_channels, ...) must NOT clobber the saved prior
    configuration (train_prior_vqvae.merge_cli_over_saved)."""
    from types import SimpleNamespace

    tp = importlib.import_module("train_prior_vqvae")
    parser = tp.build_prior_parser()
    argv = ["--model_path", "x", "--pixelcnn_num_layers", "7"]
    a = parser.parse_args(argv)
    explicit = tp.explicit_cli_args(parser, argv)
    assert set(explicit) == {"model_path", "pixelcnn_num_layers"}

    saved = SimpleNamespace(arch="vq_vae", dataset="cifar10",
                            prior_type="pixelsnail",
                            pixelcnn_hidden_channels=256,
                            pixelcnn_num_layers=15, batch_size=256)
    merged = tp.merge_cli_over_saved(saved, a, explicit)
    assert merged.prior_type == "pixelsnail"          # saved beats default
    assert merged.pixelcnn_hidden_channels == 256     # saved beats default
    assert merged.pixelcnn_num_layers == 7            # explicit beats saved
    assert merged.dataset == "cifar10"                # None default ignored
    assert merged.batch_size == 256                   # saved beats default
    assert merged.pixelcnn_epochs == 100              # default fills gaps


def test_require_live_backend_retry_paths(monkeypatch):
    """bench.py/step_cost.py ride out transient tunnel outages by bounded
    re-exec (movae_tpu.utils.require_live_backend): a backend-init
    RuntimeError below the retry cap execv's the same command line with the
    counter bumped; at the cap it re-raises; a healthy backend clears the
    counter."""
    from movae_tpu import utils as u

    class FakeJax:
        def __init__(self, ok):
            self.ok = ok

        def devices(self):
            if not self.ok:
                raise RuntimeError("Unable to initialize backend 'axon'")
            return ["cpu0"]

    # exhaustion: re-raise
    monkeypatch.setitem(sys.modules, "jax", FakeJax(ok=False))
    monkeypatch.setenv("MOVAE_BACKEND_RETRY", "20")
    with pytest.raises(RuntimeError):
        u.require_live_backend(max_retries=20, sleep_s=0)

    # below cap: execv with bumped counter
    calls = {}
    monkeypatch.setenv("MOVAE_BACKEND_RETRY", "3")
    def fake_execv(exe, argv):
        calls["x"] = (exe, argv)
        raise SystemExit(0)

    monkeypatch.setattr(os, "execv", fake_execv)
    with pytest.raises(SystemExit):
        u.require_live_backend(max_retries=20, sleep_s=0)
    assert calls["x"][0] == sys.executable
    assert os.environ["MOVAE_BACKEND_RETRY"] == "4"

    # healthy backend: counter cleared, no exec
    monkeypatch.setitem(sys.modules, "jax", FakeJax(ok=True))
    u.require_live_backend()
    assert "MOVAE_BACKEND_RETRY" not in os.environ
