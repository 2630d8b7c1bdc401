"""Batched multi-instance device search."""

import numpy as np
import pytest

import tnax
from tnax import parallel
from tnax.search import ContractionContext
from test_search_small import make_chimera_like, brute_force_min


def test_multi_search_matches_single():
    rng = np.random.default_rng(7)
    ctxs, mins = [], []
    for s in range(3):
        J = make_chimera_like(np.random.default_rng(s), 2, 2, 2)
        ins = tnax.Solver(mode="Ising", Nx=2, Ny=2, Nc=2, beta=2, J=J)
        ctxs.append(ContractionContext(ins.problem, 2.0))
        mins.append(brute_force_min(J, 8)[0])
    res = parallel.multi_search_gs(ctxs, M=64, relative_P_cutoff=1e-12,
                                   Dmax=8)
    for r, emin in zip(res, mins):
        assert r["energy"] == pytest.approx(emin, abs=1e-9)
