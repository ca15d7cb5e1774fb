"""Independent oracles for the exact hypervolume in movae_tpu/metrics/hv.py.

The reference computes HV with ``pymoo.indicators.hv.HV`` (reference
main.py:33, 659-692, 1302-1306; evaluate.py:82-106). Real pymoo is not
importable in this environment and the refharness pymoo shim delegates to
our own ``metrics/hv.py`` — so every "reference-side" HV figure in the
lockstep studies is ultimately our WFG-style recursion. These tests anchor
that recursion against two *mathematically independent* computations:

1. **Brute-force inclusion-exclusion** over point subsets:
   ``HV(∪_p box(p)) = Σ_{∅≠S⊆P} (-1)^{|S|+1} · Π_d max(0, ref_d - max_{p∈S} p_d)``
   (the intersection of axis-aligned boxes anchored at ``ref`` is the box of
   the coordinate-wise max). Exact, O(2^n), no shared code or structure with
   the WFG recursion.
2. **Monte-Carlo membership sampling** inside the ref box with a
   statistically-bounded tolerance.

Plus closed-form grid cases and the pymoo-documented invariances
(dominated-point and duplicate insensitivity, ref-point clipping).
"""

import itertools

import numpy as np
import pytest

from movae_tpu.metrics.hv import HVIndicator, build_hv_indicator, hypervolume


def hv_inclusion_exclusion(points: np.ndarray, ref: np.ndarray) -> float:
    """Exact HV via inclusion-exclusion over all nonempty point subsets."""
    pts = np.asarray(points, np.float64).reshape(-1, len(ref))
    ref = np.asarray(ref, np.float64)
    pts = pts[np.all(pts < ref, axis=1)]
    n = len(pts)
    total = 0.0
    for r in range(1, n + 1):
        sign = 1.0 if r % 2 == 1 else -1.0
        for subset in itertools.combinations(range(n), r):
            corner = np.max(pts[list(subset)], axis=0)
            total += sign * float(np.prod(np.maximum(ref - corner, 0.0)))
    return total


def hv_monte_carlo(points, ref, lo, n_samples, seed):
    """MC estimate of the dominated fraction of the [lo, ref] box."""
    rng = np.random.default_rng(seed)
    pts = np.asarray(points, np.float64)
    ref = np.asarray(ref, np.float64)
    lo = np.asarray(lo, np.float64)
    samples = rng.uniform(lo, ref, size=(n_samples, len(ref)))
    # a sample is dominated if some point is <= it in every coordinate
    dominated = np.zeros(n_samples, bool)
    for p in pts:
        dominated |= np.all(samples >= p, axis=1)
    box = float(np.prod(ref - lo))
    frac = dominated.mean()
    sem = float(np.sqrt(frac * (1 - frac) / n_samples))
    return box * frac, box * sem


@pytest.mark.parametrize("m", [3, 4, 5])
@pytest.mark.parametrize("n", [2, 4, 8])
def test_wfg_matches_inclusion_exclusion_random_sets(m, n):
    rng = np.random.default_rng(1000 * m + n)
    for trial in range(10):
        pts = rng.uniform(0.0, 1.2, size=(n, m))  # some beyond ref
        ref = np.full(m, 1.1)
        ours = hypervolume(pts, ref)
        oracle = hv_inclusion_exclusion(pts, ref)
        assert ours == pytest.approx(oracle, rel=1e-12, abs=1e-12), (
            f"m={m} n={n} trial={trial}")


@pytest.mark.parametrize("m", [2, 3])
def test_wfg_matches_inclusion_exclusion_degenerate_sets(m):
    """Clustered / duplicated / axis-tied points (the WFG recursion's
    sort-and-clip steps are most fragile under ties)."""
    rng = np.random.default_rng(77 + m)
    for trial in range(10):
        base = rng.uniform(0.2, 1.0, size=(3, m))
        pts = np.concatenate([
            base,
            base + 0.0,                       # exact duplicates
            base * [0.5] + 0.0,               # scaled copies
            np.round(rng.uniform(0, 1.1, size=(4, m)), 1),  # gridded ties
        ])
        ref = np.full(m, 1.1)
        ours = hypervolume(pts, ref)
        oracle = hv_inclusion_exclusion(pts, ref)
        assert ours == pytest.approx(oracle, rel=1e-12, abs=1e-12)


def test_wfg_matches_monte_carlo():
    rng = np.random.default_rng(7)
    m = 4
    pts = rng.uniform(0.1, 1.0, size=(6, m))
    ref = np.full(m, 1.1)
    ours = hypervolume(pts, ref)
    mc, sem = hv_monte_carlo(pts, ref, lo=np.zeros(m), n_samples=400_000,
                             seed=11)
    assert abs(ours - mc) < 5 * sem + 1e-9, (ours, mc, sem)


def test_closed_form_grid_staircase():
    # 2-D staircase front: HV = sum of disjoint slabs, computable by hand.
    # points (0.2, 0.8), (0.5, 0.5), (0.8, 0.2), ref (1, 1):
    # slabs: x in [0.2, 0.5): height 1-0.8; [0.5, 0.8): 1-0.5; [0.8, 1): 1-0.2
    pts = np.array([[0.2, 0.8], [0.5, 0.5], [0.8, 0.2]])
    expected = 0.3 * 0.2 + 0.3 * 0.5 + 0.2 * 0.8
    assert hypervolume(pts, np.array([1.0, 1.0])) == pytest.approx(expected)


def test_invariances_and_clipping():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0.2, 1.0, size=(5, 3))
    ref = np.full(3, 1.1)
    base = hypervolume(pts, ref)
    # adding a dominated point changes nothing
    dominated = pts[0] + 0.05
    assert hypervolume(np.vstack([pts, dominated]), ref) == pytest.approx(
        base, rel=1e-12)
    # duplicates change nothing
    assert hypervolume(np.vstack([pts, pts]), ref) == pytest.approx(
        base, rel=1e-12)
    # a point outside the ref box contributes nothing
    outside = np.array([[1.2, 0.1, 0.1]])
    assert hypervolume(np.vstack([pts, outside]), ref) == pytest.approx(
        base, rel=1e-12)
    # single point: product form (the reference's per-epoch use,
    # main.py:1302-1306 evaluates HV of ONE mean-loss vector)
    p = np.array([0.3, 0.4, 0.5])
    assert hypervolume(p[None], ref) == pytest.approx(
        float(np.prod(ref - p)), rel=1e-15)


def test_indicator_and_builder_against_oracle():
    ind = build_hv_indicator(["a", "b", "c"], hv_ref=[1.0, 1.5, 2.0])
    assert isinstance(ind, HVIndicator)
    rng = np.random.default_rng(9)
    pts = rng.uniform(0.0, 1.0, size=(6, 3))
    oracle = hv_inclusion_exclusion(pts, np.array([1.0, 1.5, 2.0]))
    assert ind(pts) == pytest.approx(oracle, rel=1e-12)
