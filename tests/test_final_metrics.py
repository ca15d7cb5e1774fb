"""Generative-metrics parity regressions (reference main.py:695-887):

  * the sample count is --max_gen_metrics_samples (main.py:721), NOT
    --max_fid_samples (recon pass only);
  * real and generated sets are mutually truncated to min(n) before every
    metric (main.py:811-816);
  * the returned key set always includes precision/recall as nan (the
    reference returns them with the computation commented out);
  * multi-chunk generation keeps ONE static sampler batch shape (the
    ragged tail is padded and sliced on the host);
  * IS splits are floor-sized with the tail remainder dropped
    (metrics.py:905).
"""

from types import SimpleNamespace

import jax
import numpy as np

from movae_tpu.train import final_metrics


class _StubModel:
    """Records every sample batch size generate_samples requests."""

    def __init__(self):
        self.sample_batches = []

    def apply(self, variables, b, method=None, rngs=None):
        assert method == "sample"
        self.sample_batches.append(b)
        return jax.numpy.zeros((b, 4, 4, 3))


class _StubLoader:
    def __init__(self, n, batch=4):
        self.n, self.batch = n, batch

    def __iter__(self):
        left = self.n
        while left > 0:
            b = min(self.batch, left)
            yield np.zeros((b, 4, 4, 3), np.float32), None, b
            left -= b


def _state():
    return SimpleNamespace(params={}, batch_stats={})


def test_generate_samples_static_chunk_shape():
    model = _StubModel()
    args = SimpleNamespace(batch_size=4)
    out = final_metrics.generate_samples(
        model, _state(), args, None, jax.random.PRNGKey(0), 10, batch=4)
    assert out.shape == (10, 4, 4, 3)
    # every chunk used the SAME static batch (no ragged-tail recompile)
    assert model.sample_batches == [4, 4, 4]
    # single-chunk figure calls keep their exact size (no padding waste)
    model2 = _StubModel()
    out2 = final_metrics.generate_samples(
        model2, _state(), args, None, jax.random.PRNGKey(0), 3, batch=4)
    assert out2.shape[0] == 3 and model2.sample_batches == [3]


def test_gen_metrics_driven_by_max_gen_metrics_samples(monkeypatch):
    seen = {}

    def fake_generate(model, state, args, prior, rng, num, batch=64):
        seen["num"] = num
        return np.zeros((num, 4, 4, 3), np.float32)

    monkeypatch.setattr(final_metrics, "generate_samples", fake_generate)
    args = SimpleNamespace(batch_size=4, max_fid_samples=64,
                           max_gen_metrics_samples=6)
    out = final_metrics.evaluate_generative_metrics(
        _StubModel(), _state(), _StubLoader(32), args, None,
        jax.random.PRNGKey(0))
    # max_fid_samples must NOT leak into the generative pass
    assert seen["num"] == 6
    assert set(out) == {"gfid", "inception_score_mean",
                        "inception_score_std", "precision", "recall", "kid"}
    assert np.isnan(out["precision"]) and np.isnan(out["recall"])


def test_gen_metrics_mutual_truncation(monkeypatch):
    lengths = {}

    def fake_generate(model, state, args, prior, rng, num, batch=64):
        return np.zeros((num, 4, 4, 3), np.float32)

    def fake_extract(images, *a, **k):
        lengths.setdefault("sets", []).append(len(images))
        return np.random.default_rng(len(images)).normal(
            size=(len(images), 8))

    def fake_is(images, *a, **k):
        lengths["is"] = len(images)
        return 1.0, 0.0

    monkeypatch.setattr(final_metrics, "generate_samples", fake_generate)
    monkeypatch.setattr(final_metrics.feat_lib,
                        "extract_inception_features", fake_extract)
    monkeypatch.setattr(final_metrics.feat_lib,
                        "calculate_inception_score", fake_is)
    args = SimpleNamespace(batch_size=4, max_gen_metrics_samples=16)
    final_metrics.evaluate_generative_metrics(
        _StubModel(), _state(), _StubLoader(6), args, None,
        jax.random.PRNGKey(0))
    # only 6 reals exist: every metric must see 6 vs 6 (main.py:811-816)
    assert lengths["sets"] == [6, 6]
    assert lengths["is"] == 6


def test_gen_metrics_nonpositive_count_skips():
    args = SimpleNamespace(batch_size=4, max_gen_metrics_samples=0)
    out = final_metrics.evaluate_generative_metrics(
        _StubModel(), _state(), _StubLoader(4), args, None,
        jax.random.PRNGKey(0))
    assert all(np.isnan(v) for v in out.values())
    assert len(out) == 6


def test_inception_score_drops_split_remainder():
    from movae_tpu.metrics.features import inception_score_from_probs

    rng = np.random.default_rng(0)
    probs = rng.dirichlet(np.ones(5), size=25)
    got = inception_score_from_probs(probs, splits=10)
    # reference slicing: ten floor-size (2) splits covering 20 rows,
    # remainder 5 dropped (metrics.py:905)
    scores = []
    for i in range(10):
        part = probs[i * 2:(i + 1) * 2]
        py = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-16) - np.log(py + 1e-16))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    np.testing.assert_allclose(got, (np.mean(scores), np.std(scores)),
                               rtol=1e-12)
    # the last 5 rows must not influence the result
    probs2 = probs.copy()
    probs2[20:] = rng.dirichlet(np.ones(5), size=5)
    np.testing.assert_allclose(inception_score_from_probs(probs2, 10), got,
                               rtol=1e-12)
