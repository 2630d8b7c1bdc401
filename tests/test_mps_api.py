"""Expectation-value API and 'lr' preconditioning sanity."""

import numpy as np
import jax.numpy as jnp
import pytest

import tnax
from tnax import bmps
from test_bmps import random_mps, dense_state
from test_search_small import make_chimera_like


def test_measure_O1_matches_dense():
    rng = np.random.default_rng(0)
    A = random_mps(rng, L=4, D=3, d=2, Dpad=4)
    psi = dense_state(A).reshape([2] * 4)
    O = rng.normal(size=(2, 2))
    got = np.asarray(bmps.measure_O1(A, jnp.asarray(O)))
    norm = np.sum(psi ** 2)
    for n in range(4):
        contracted = np.tensordot(O, psi, axes=(1, n))  # out axis first
        contracted = np.moveaxis(contracted, 0, n)
        want = np.sum(psi * contracted) / norm
        assert got[n] == pytest.approx(want, rel=1e-9)


def test_measure_correlations_symmetric():
    rng = np.random.default_rng(1)
    A = random_mps(rng, L=4, D=3, d=2, Dpad=4)
    psi = dense_state(A).reshape([2] * 4)
    O = np.diag([1.0, -1.0])  # Z operator
    got = bmps.measure_correlations(A, O)
    norm = np.sum(psi ** 2)
    # dense two-point check
    def apply(n, p):
        c = np.tensordot(O, p, axes=(1, n))
        return np.moveaxis(c, 0, n)
    for n in range(4):
        for m in range(4):
            p = apply(n, psi) if n == m else apply(n, apply(m, psi))
            want = np.sum(psi * p) / norm
            assert got[n, m] == pytest.approx(want, rel=1e-8)


def test_lr_preconditioning_invariant():
    rng = np.random.default_rng(2)
    J = make_chimera_like(rng, 3, 3, 2)
    ins = tnax.Solver(mode="Ising", Nx=3, Ny=3, Nc=2, beta=2, J=J)
    E0 = ins.search_ground_state(M=128, relative_P_cutoff=1e-12, Dmax=8)[0]
    ins2 = tnax.Solver(mode="Ising", Nx=3, Ny=3, Nc=2, beta=2, J=J)
    ins2.precondition(mode="balancing", directions=("ud", "lr"))
    X = ins2._gauges
    assert np.max(np.abs(X["Xd"][:-1] * X["Xu"][1:] - 1)) < 1e-12
    assert np.max(np.abs(X["Xr"][:, :-1] * X["Xl"][:, 1:] - 1)) < 1e-12
    E1 = ins2.search_ground_state(M=128, relative_P_cutoff=1e-12, Dmax=8)[0]
    assert E1 == pytest.approx(E0, abs=1e-9)


def test_measure_O2_matches_dense():
    rng = np.random.default_rng(3)
    A = random_mps(rng, L=4, D=3, d=2, Dpad=4)
    psi = dense_state(A).reshape([2] * 4)
    O = rng.normal(size=(2, 2, 2, 2))
    got = bmps.measure_O2(A, O)
    norm = np.sum(psi ** 2)
    for n in range(3):
        c = np.tensordot(O, psi, axes=([2, 3], [n, n + 1]))
        c = np.moveaxis(c, [0, 1], [n, n + 1])
        want = np.sum(psi * c) / norm
        assert got[n] == pytest.approx(want, rel=1e-9)


def test_describe():
    rng = np.random.default_rng(4)
    A = random_mps(rng, L=3, D=2, d=2, Dpad=4)
    s = bmps.describe(bmps.MPS(A=A, lognorm=jnp.zeros(())))
    assert "L=3" in s and "ranks" in s


def test_init_mps_and_expectation_mpo():
    from tnax.bmps import (init_mps, identity_mpo, expectation_mpo,
                           mps_dot, mpo_from_block)
    for initial in ("X", "Z", "randR"):
        m = init_mps(4, 4, 2, jnp.float64, initial=initial, canonize="left")
        # identity MPO expectation equals the norm
        W = identity_mpo(4, 2, 2, jnp.float64)
        e = float(expectation_mpo(m.A, W, m.A))
        n = float(mps_dot(m.A, m.A))
        assert e == pytest.approx(n, rel=1e-10)
    blk = np.arange(16.0).reshape(4, 4)
    t = mpo_from_block(jnp.asarray(blk), 2, 2)
    assert t.shape == (2, 2, 2, 2)
    assert float(t[1, 0, 1, 1]) == blk[2, 3]


def test_init_mps_randC():
    from tnax.bmps import init_mps, mps_dot
    m = init_mps(3, 4, 2, jnp.float64, initial="randC", canonize="right")
    n = mps_dot(np.conj(m.A), m.A)
    assert abs(complex(n).imag) < 1e-10
    assert complex(n).real > 0


def test_expectation_1mpo_mix_matches_full():
    """Replacing one MPO site through cached environments equals the full
    sandwich with the modified MPO (reference expectation_1mpo_mix,
    tnac4o/mps.py:593-603)."""
    import jax.numpy as jnp
    from tnax import bmps
    rng = np.random.default_rng(4)
    L, D, d, lh = 5, 3, 2, 3
    bra = bmps.init_mps(L, D, d, jnp.float64, initial="randR", seed=1).A
    ket = bmps.init_mps(L, D, d, jnp.float64, initial="randR", seed=2).A
    W = jnp.asarray(rng.standard_normal((L, lh, d, lh, d)))
    for n in (0, 2, L - 1):
        Wn = jnp.asarray(rng.standard_normal((lh, d, lh, d)))
        got = bmps.expectation_1mpo_mix(bra, W, ket, n, Wn)
        want = bmps.expectation_mpo(bra, W.at[n].set(Wn), ket)
        assert np.isclose(float(got), float(want), rtol=1e-10), n
        # list variant: a stack of replacements in one call
        Wns = jnp.asarray(rng.standard_normal((4, lh, d, lh, d)))
        gotl = np.asarray(bmps.expectation_list_1mpo_mix(bra, W, ket, n,
                                                         Wns))
        wantl = [float(bmps.expectation_mpo(bra, W.at[n].set(Wns[i]), ket))
                 for i in range(4)]
        assert np.allclose(gotl, wantl, rtol=1e-10), n
