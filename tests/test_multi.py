"""Batched multi-instance device search (single-chip vmap and mesh modes)."""

import numpy as np
import jax
import pytest

import tnax
from tnax import parallel
from tnax.search import ContractionContext
from test_search_small import make_chimera_like, brute_force_min


def _instances(n, Nx=2, Ny=2, Nc=2, beta=2.0):
    ctxs, mins = [], []
    for s in range(n):
        J = make_chimera_like(np.random.default_rng(s), Nx, Ny, Nc)
        ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=beta, J=J)
        ctxs.append(ContractionContext(ins.problem, beta))
        mins.append(brute_force_min(J, Nx * Ny * Nc)[0])
    return ctxs, mins


def test_multi_search_matches_single():
    ctxs, mins = _instances(3)
    res = parallel.multi_search_gs(ctxs, M=64, relative_P_cutoff=1e-12,
                                   Dmax=8)
    for r, emin in zip(res, mins):
        assert r["energy"] == pytest.approx(emin, abs=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_multi_search_with_mesh():
    """multi_search_gs with an actual ('data','beam') mesh — instances
    sharded across the data axis (VERDICT.md weakness 6)."""
    mesh = parallel.make_mesh(8, 1)
    ctxs, mins = _instances(8)
    res = parallel.multi_search_gs(ctxs, M=64, relative_P_cutoff=1e-12,
                                   Dmax=8, mesh=mesh)
    for r, emin in zip(res, mins):
        assert r["energy"] == pytest.approx(emin, abs=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_search_end_to_end():
    """Full multi-chip search (boundary stacks + every row + final gather)
    on a (2, 4) data x beam mesh matches the single-chip device search,
    including degeneracy counts."""
    mesh = parallel.make_mesh(2, 4)
    # degenerate couplings to exercise merge/degeneracy across shards
    ctxs2 = []
    for s in range(2):
        J = make_chimera_like(np.random.default_rng(s), 3, 3, 2, field=False)
        J = [j for j in tnax.round_Jij(J, 1.0) if j[2] != 0]
        ins = tnax.Solver(mode="Ising", Nx=3, Ny=3, Nc=2, beta=1.5, J=J)
        ctxs2.append(ContractionContext(ins.problem, 1.5))
    res_sh = parallel.sharded_search_gs(ctxs2, mesh, M=64,
                                        relative_P_cutoff=1e-12, Dmax=8)
    for c, r in zip(ctxs2, res_sh):
        single = parallel.device_search_gs(c, M=64,
                                           relative_P_cutoff=1e-12, Dmax=8)
        assert r["energy"] == pytest.approx(single["energy"], abs=1e-9)
        assert r["degeneracy"] == single["degeneracy"]
        assert (r["states"] == single["states"]).all()


def test_multi_sample_energies_consistent():
    """Fleet Gibbs sampling (one vmapped dispatch for B instances): each
    instance's reported energies match an independent recomputation from
    the decoded spin states (the reference e02 consistency contract,
    `examples/test_examples.py:36-56`), and a fixed seed is deterministic."""
    Nx, Ny, Nc = 2, 2, 2
    solvers, ctxs, Js = [], [], []
    for s in range(3):
        J = make_chimera_like(np.random.default_rng(s), Nx, Ny, Nc)
        ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
        solvers.append(ins)
        Js.append(J)
        ctxs.append(ins._context())
    rs = parallel.multi_sample(ctxs, M=32, Dmax=8, seed=3)
    rs2 = parallel.multi_sample(ctxs, M=32, Dmax=8, seed=3)
    for ins, J, r, r2 in zip(solvers, Js, rs, rs2):
        assert r["states"].shape == (32, Nx * Ny)
        assert (r["states"] == r2["states"]).all()
        ins.states = r["states"][:, ins.order]
        E2 = tnax.energy_Jij(J, ins.binary_states())
        assert np.max(np.abs(r["energy"] - E2)) < 1e-9
    # instances differ and walker streams differ across instances
    assert not (rs[0]["states"] == rs[1]["states"]).all()

def test_flagship_sample_matches_separate_phases():
    """The one-dispatch sampling program (ladder + PEPS + boundary +
    sampling scan fused, `parallel.flagship_sample`) draws bit-identical
    states to the separate-phase pipeline (precondition + device_sample)
    under the same seed, and its energies satisfy the e02 consistency
    contract (reference `examples/test_examples.py:54-56`)."""
    Nx, Ny, Nc = 3, 3, 4
    J = make_chimera_like(np.random.default_rng(5), Nx, Ny, Nc)
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
    ins.precondition(mode="balancing")
    r1 = parallel.device_sample(ins._context(), M=32, Dmax=8, seed=7)
    ins2 = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
    r2 = parallel.flagship_sample(ins2, M=32, Dmax=8, seed=7, pre_steps=2)
    assert (np.asarray(r1["states"]) == np.asarray(r2["states"])).all()
    assert np.max(np.abs(r1["energy"] - r2["energy"])) < 1e-9
    ins2.states = np.asarray(r2["states"])[:, ins2.order]
    E2 = tnax.energy_Jij(J, ins2.binary_states())
    assert np.max(np.abs(r2["energy"] - E2)) < 1e-9


def test_multi_flagship_sample_matches_multi_sample():
    """multi_flagship_sample (the vmapped one-dispatch fleet sampler) is
    bit-identical to multi_sample over preconditioned contexts (same
    fold_in PRNG streams, same gauges at pre_steps=2)."""
    Nx, Ny, Nc = 2, 2, 4
    solvers, ctxs = [], []
    for s in range(3):
        J = make_chimera_like(np.random.default_rng(20 + s), Nx, Ny, Nc)
        ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
        ins.precondition(mode="balancing")
        ctxs.append(ins._context())
        solvers.append(tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc,
                                   beta=2, J=J))
    rs1 = parallel.multi_sample(ctxs, M=16, Dmax=8, seed=11)
    rs2 = parallel.multi_flagship_sample(solvers, M=16, Dmax=8, seed=11,
                                         pre_steps=2)
    for r1, r2 in zip(rs1, rs2):
        assert (np.asarray(r1["states"]) == np.asarray(r2["states"])).all()
        assert np.max(np.abs(r1["energy"] - r2["energy"])) < 1e-9
