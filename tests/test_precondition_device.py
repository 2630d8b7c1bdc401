"""On-device balancing preconditioner: gebal parity with LAPACK and
gauge parity with the host sweep (reference `_update_conditioning('ud')`,
`tnac4o/tnac4o.py:1824-1918`)."""

import numpy as np
import jax.numpy as jnp
import scipy.linalg
import pytest

import tnax
from tnax import engine, precondition
from test_search_small import make_chimera_like


def test_gebal_matches_scipy():
    rng = np.random.default_rng(0)
    for n in (2, 3, 5, 8, 12):
        for trial in range(5):
            A = rng.standard_normal((n, n))
            # make it badly scaled, like mixed bond environments
            A *= np.exp2(rng.integers(-20, 20, size=(n, 1)))
            _, (want, _) = scipy.linalg.matrix_balance(
                A, permute=False, separate=True)
            got = np.asarray(precondition.gebal_scale(
                jnp.asarray(A), jnp.asarray(n), 1e30))
            assert np.array_equal(got, want), (n, trial)


def test_gebal_padding_and_clip():
    rng = np.random.default_rng(1)
    n, nd = 8, 5
    A = rng.standard_normal((n, n)) * np.exp2(
        rng.integers(-30, 30, size=(n, 1)))
    got = np.asarray(precondition.gebal_scale(jnp.asarray(A),
                                              jnp.asarray(nd), 32.0))
    _, (want, _) = scipy.linalg.matrix_balance(A[:nd, :nd], permute=False,
                                               separate=True)
    want = np.clip(want, 1 / 32.0, 32.0)
    assert np.array_equal(got[:nd], want)
    assert (got[nd:] == 1.0).all()


def test_balance_ud_device_matches_host():
    rng = np.random.default_rng(7)
    Nx, Ny, Nc = 3, 4, 2
    J = make_chimera_like(rng, Nx, Ny, Nc)
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
    grid = engine.pad_grid(ins.problem)
    g0 = engine.identity_gauges(grid)

    ov_h, ov_d = [], []
    Xh = precondition.balance_ud(ins.problem, 1.0, g0, overlaps_out=ov_h)
    Xd = precondition.balance_ud_device(ins.problem, 1.0, g0,
                                        overlaps_out=ov_d)
    for k in Xh:
        assert np.allclose(Xd[k], Xh[k], rtol=1e-9), k
    assert np.allclose(ov_d[0], ov_h[0], rtol=1e-6, atol=1e-9)

    # second ladder step on the updated gauges (the real call pattern)
    Xh2 = precondition.balance_ud(ins.problem, 2.0, Xh)
    Xd2 = precondition.balance_ud_device(ins.problem, 2.0, Xd)
    for k in Xh2:
        assert np.allclose(Xd2[k], Xh2[k], rtol=1e-9), k


def test_solver_precondition_device_path_golden():
    """precondition(path='device') gives the same search result as the
    host path on a small instance."""
    rng = np.random.default_rng(11)
    Nx, Ny, Nc = 2, 2, 2
    J = make_chimera_like(rng, Nx, Ny, Nc)
    res = {}
    for path in ("host", "device"):
        ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
        ins.precondition(mode="balancing", path=path)
        E = ins.search_ground_state(M=64, relative_P_cutoff=1e-12, Dmax=8)
        res[path] = (E[0], ins.degeneracy)
    assert res["device"][0] == pytest.approx(res["host"][0], abs=1e-9)
    assert res["device"][1] == res["host"][1]


def test_ladder_program_matches_per_rung():
    """The fused beta-ladder device program equals sequential per-rung
    balance_ud_device calls (gauges and overlap bookkeeping)."""
    rng = np.random.default_rng(3)
    Nx, Ny, Nc = 3, 3, 2
    J = make_chimera_like(rng, Nx, Ny, Nc)
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
    grid = engine.pad_grid(ins.problem)
    g0 = engine.identity_gauges(grid)

    ov_a, ov_b = [], []
    Xa = dict(g0)
    for beta in (1.0, 2.0):
        Xa = precondition.balance_ud_device(ins.problem, beta, Xa,
                                            overlaps_out=ov_a)
    Xb = precondition.precondition_ladder_device(ins.problem, [1.0, 2.0],
                                                 g0, overlaps_out=ov_b)
    for k in Xa:
        assert np.allclose(Xb[k], Xa[k], rtol=1e-9), k
    assert len(ov_b) == 2
    for a, b in zip(ov_a, ov_b):
        assert np.allclose(a, b, rtol=1e-6, atol=1e-9)


def test_precondition_fleet_parity():
    """precondition_fleet (one vmapped ladder program over the instance
    axis) is bit-identical per instance to precondition_ladder_device —
    the batched lax.while_loop masks converged lanes."""
    import tnax
    from tnax import engine, precondition as pre

    problems = []
    for i in (1, 2):
        J = tnax.load_Jij(
            "/root/reference/instances/Chimera_droplet_instances/"
            "chimera128_spinglass_power/%03d.txt" % i)
        J = tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)
        ins = tnax.Solver(mode="Ising", Nx=4, Ny=4, Nc=8, J=J, beta=3)
        problems.append(ins.problem)
    betas = [0.75, 1.5]
    fleet = pre.precondition_fleet(problems, betas)
    for p, Xf in zip(problems, fleet):
        Xs = pre.precondition_ladder_device(
            p, betas, engine.identity_gauges(engine.pad_grid(p)))
        for k in Xs:
            assert np.array_equal(Xs[k], Xf[k]), k
