"""Anchor tests for the refharness torchjd shim (refharness/shims/torchjd).

The cross-framework equivalence study (scripts/equivalence_study.py) runs
the reference pipeline on top of this shim, so the shim itself must be
verified independently: UPGrad against torchjd's published docstring
example, backward/mtl_backward against brute-force autograd, and the
dual-cone projection against its defining variational properties.

Only the ``torchjd`` package is imported from the shims directory; the
path is removed again at module-import end so the wandb/torchvision/pymoo
shims can never shadow real-module fallback behavior in other tests.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_SHIMS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "refharness", "shims")
sys.path.insert(0, _SHIMS)
try:
    import torchjd
    from torchjd.aggregation import (CAGrad, IMTLG, DualProj, Mean, NashMTL,
                                     PCGrad, Sum, UPGrad)
    from torchjd.aggregation._utils.dual_cone import project_weights
    from torchjd.autojac import backward, mtl_backward
finally:
    sys.path.remove(_SHIMS)

assert torchjd.__file__.startswith(_SHIMS)


def test_upgrad_matches_published_example():
    """torchjd's own docstring example (also quoted by the reference,
    utils/torchmoo/nupgrad.py:55-64)."""
    J = torch.tensor([[-4.0, 1.0, 1.0], [6.0, 1.0, 1.0]])
    out = UPGrad()(J)
    np.testing.assert_allclose(out.numpy(), [0.2929, 1.9004, 1.9004],
                               atol=2e-3)


def test_dual_cone_projection_properties():
    """proj(g) lies in the dual cone {d: Jd >= 0}; gradients already in
    the cone are fixed points; Moreau residual g - proj(g) is in the polar
    cone and orthogonal to proj(g)."""
    rng = np.random.default_rng(0)
    for _ in range(10):
        J = torch.tensor(rng.normal(size=(4, 12)), dtype=torch.float64)
        G = J @ J.T
        U = torch.eye(4, dtype=torch.float64) / 4
        W = project_weights(U, G, "quadprog")
        for i in range(4):
            d = W[i] @ J
            assert torch.all(J @ d >= -1e-8), "projection left the cone"
            resid = (U[i] - W[i]) @ J
            assert abs(float(resid @ d)) < 1e-8, "Moreau orthogonality"
        # a strictly-interior gradient is its own projection
        pos = torch.ones(4, dtype=torch.float64)
        Jpos = torch.cat([J, (pos @ J)[None, :]])  # last row = sum of rows
        Gpos = Jpos @ Jpos.T
        u = torch.zeros(5, dtype=torch.float64)
        u[4] = 1.0
        if torch.all(Jpos @ Jpos[4] > 0):
            w = project_weights(u[None, :], Gpos, "quadprog")[0]
            np.testing.assert_allclose((w @ Jpos).numpy(),
                                       Jpos[4].numpy(), atol=1e-8)


def _tiny_problem(seed=0):
    g = torch.Generator().manual_seed(seed)
    lin1 = torch.nn.Linear(5, 4)
    lin2 = torch.nn.Linear(4, 3)
    head_a = torch.nn.Linear(3, 1)
    head_b = torch.nn.Linear(3, 1)
    for m in (lin1, lin2, head_a, head_b):
        for p in m.parameters():
            torch.nn.init.normal_(p, generator=g)
    x = torch.randn(6, 5, generator=g)
    return lin1, lin2, head_a, head_b, x


def test_backward_matches_manual_jacobian():
    lin1, lin2, head_a, head_b, x = _tiny_problem()
    feats = lin2(torch.tanh(lin1(x)))
    la = head_a(feats).pow(2).mean()
    lb = head_b(feats).abs().mean()
    params = (list(lin1.parameters()) + list(lin2.parameters())
              + list(head_a.parameters()) + list(head_b.parameters()))

    backward([la, lb], aggregator=Sum())
    got = {id(p): p.grad.clone() for p in params}
    for p in params:
        p.grad = None

    (la + lb).backward(retain_graph=True)
    for p in params:
        expect = p.grad if p.grad is not None else torch.zeros_like(p)
        np.testing.assert_allclose(got[id(p)].numpy(), expect.numpy(),
                                   rtol=1e-6, atol=1e-7)


def test_backward_mean_is_half_sum():
    lin1, lin2, head_a, head_b, x = _tiny_problem(1)
    feats = lin2(torch.tanh(lin1(x)))
    la, lb = head_a(feats).pow(2).mean(), head_b(feats).pow(2).mean()
    backward([la, lb], aggregator=Mean())
    got = lin1.weight.grad.clone()
    lin1.weight.grad = None
    backward([la, lb], aggregator=Sum())
    np.testing.assert_allclose(got.numpy(),
                               (lin1.weight.grad / 2).numpy(), rtol=1e-6)


def test_mtl_backward_partition_and_sum_equivalence():
    """With the Sum aggregator, mtl_backward must equal plain backward of
    the summed loss: shared params get d(sum)/dp via the aggregated
    feature cotangent, task heads get their own loss's gradient."""
    lin1, lin2, head_a, head_b, x = _tiny_problem(2)
    feats = lin2(torch.tanh(lin1(x)))
    la = head_a(feats).pow(2).mean()
    lb = head_b(torch.sin(feats)).mean()
    shared = list(lin1.parameters()) + list(lin2.parameters())
    heads = list(head_a.parameters()) + list(head_b.parameters())

    mtl_backward(losses=[la, lb], features=[feats], aggregator=Sum(),
                 retain_graph=True)
    got = {id(p): p.grad.clone() for p in shared + heads}
    for p in shared + heads:
        p.grad = None

    (la + lb).backward()
    for p in shared + heads:
        np.testing.assert_allclose(got[id(p)].numpy(), p.grad.numpy(),
                                   rtol=1e-6, atol=1e-7,
                                   err_msg="mtl_backward(Sum) != backward")


def test_mtl_backward_task_params_unweighted():
    """Task-head gradients must NOT be scaled by the aggregator weights
    (torchjd contract: only shared params see the aggregation)."""
    lin1, lin2, head_a, head_b, x = _tiny_problem(3)
    feats = lin2(torch.tanh(lin1(x)))
    la = head_a(feats).pow(2).mean()
    lb = head_b(feats).pow(2).mean()
    mtl_backward(losses=[la, lb], features=[feats], aggregator=Mean(),
                 retain_graph=True)
    got_head = head_a.weight.grad.clone()
    head_a.weight.grad = None
    ga = torch.autograd.grad(la, head_a.weight, retain_graph=True)[0]
    np.testing.assert_allclose(got_head.numpy(), ga.numpy(), rtol=1e-6)


def test_upgrad_no_conflict_equals_mean():
    """When task gradients don't conflict (positive Gramian), the dual-cone
    projections are identities and UPGrad == Mean."""
    J = torch.tensor([[1.0, 0.2], [0.8, 0.5]])
    np.testing.assert_allclose(UPGrad()(J).numpy(), Mean()(J).numpy(),
                               atol=1e-3)


def test_pcgrad_matches_published_example():
    """torchjd docs example (J=[[-4,1,1],[6,1,1]] -> [0.5848, 3.8012,
    3.8012]); for m=2 the result is projection-order independent, and the
    value is also the closed-form PCGrad (Yu et al. 2020) hand derivation:
    g1' = g1 - (g1.g2/|g2|^2) g2, g2' symmetric, summed."""
    J = torch.tensor([[-4.0, 1.0, 1.0], [6.0, 1.0, 1.0]])
    out = PCGrad()(J)
    np.testing.assert_allclose(out.numpy(), [0.5848, 3.8012, 3.8012],
                               atol=2e-4)


def test_cagrad_matches_published_example():
    """torchjd docs example at c=0.5 -> [0.1835, 1.2041, 1.2041]. Upstream
    returns g_0 + lam*g_w with NO 1/(1+c^2) rescale (the CAGrad paper's
    optional rescale is not applied) — this anchors that convention, which
    movae_tpu's _cagrad_alpha shares."""
    J = torch.tensor([[-4.0, 1.0, 1.0], [6.0, 1.0, 1.0]])
    out = CAGrad(c=0.5)(J)
    np.testing.assert_allclose(out.numpy(), [0.1835, 1.2041, 1.2041],
                               atol=2e-3)


def test_nashmtl_first_order_conditions():
    """NashMTL's bargaining solution is defined by alpha > 0 with
    G alpha = 1/alpha (Navon et al. 2022, eq. 5 first-order conditions —
    the same property movae_tpu's _nashmtl_solve is KKT-anchored to in
    tests/test_solvers.py). The shim's scipy solver must satisfy it on
    conflicting and benign Gramians alike."""
    rng = np.random.default_rng(0)
    for m in (2, 3, 4):
        J = torch.tensor(rng.normal(size=(m, 10)), dtype=torch.float64)
        G = J @ J.T
        agg = NashMTL(n_tasks=m)
        # aggregator.weighting is MATRIX-level (takes J); the Gramian-level
        # weighting underneath is what the first-order condition is on
        alpha = agg.weighting.psd_weighting(G).double()
        resid = G @ alpha - 1.0 / alpha
        assert float(resid.abs().max()) < 1e-5, resid


def test_nashmtl_update_cadence():
    """update_weights_every=k: the solve refreshes only every k-th call,
    returning the carried weights in between (the reference passes
    k=len(train_loader), main.py:1220)."""
    J1 = torch.tensor([[-4.0, 1.0, 1.0], [6.0, 1.0, 1.0]])
    J2 = torch.tensor([[2.0, 0.0, 1.0], [0.0, 3.0, 1.0]])
    agg = NashMTL(n_tasks=2, update_weights_every=2)
    w = agg.weighting.psd_weighting
    a = w(J1 @ J1.T)
    b = w(J2 @ J2.T)  # second call: no refresh
    np.testing.assert_allclose(a.numpy(), b.numpy())
    c = w(J2 @ J2.T)  # third call: refresh on J2's Gramian
    assert not np.allclose(a.numpy(), c.numpy())


def test_dualproj_and_imtlg_shapes():
    J = torch.tensor([[-4.0, 1.0, 1.0], [6.0, 1.0, 1.0]])
    for agg in (DualProj(), IMTLG()):
        out = agg(J)
        assert out.shape == (3,)
        assert torch.isfinite(out).all()
