"""Exact brute-force parity of the search/sampling on small instances."""

import itertools

import numpy as np
import pytest

import tnax
from tnax.problems import energy_Jij, energy_RMF


def make_chimera_like(rng, Nx, Ny, Nc, intra=True, field=True):
    L = Nx * Ny * Nc
    J = []
    for i in range(L):
        if field:
            J.append([i, i, float(rng.normal())])
    for ny in range(Ny):
        for nx in range(Nx):
            b = Nc * (Nx * ny + nx)
            for a in range(Nc):
                if intra:
                    for c in range(a + 1, Nc):
                        J.append([b + a, b + c, float(rng.normal())])
                if nx + 1 < Nx:
                    for c in range(Nc):
                        J.append([b + a, Nc * (Nx * ny + nx + 1) + c,
                                  float(rng.normal())])
                if ny + 1 < Ny:
                    for c in range(Nc):
                        J.append([b + a, Nc * (Nx * (ny + 1) + nx) + c,
                                  float(rng.normal())])
    return J


def brute_force_min(J, L):
    bits = ((np.arange(2 ** L)[:, None] >> np.arange(L)[None, :]) & 1)
    E = energy_Jij(J, 1 - bits)
    return E.min(), E


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gs_matches_brute_force(seed):
    rng = np.random.default_rng(seed)
    Nx, Ny, Nc = 2, 2, 2
    L = Nx * Ny * Nc
    J = make_chimera_like(rng, Nx, Ny, Nc)
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
    Eng = ins.search_ground_state(M=64, relative_P_cutoff=1e-12, Dmax=8)
    Emin, _ = brute_force_min(J, L)
    assert Eng[0] == pytest.approx(Emin, abs=1e-9)
    assert energy_Jij(J, ins.binary_states())[0] == pytest.approx(Emin,
                                                                  abs=1e-9)


def test_degeneracy_exact_count():
    """Couplings in multiples of 1 -> countable exact degeneracy."""
    rng = np.random.default_rng(5)
    Nx, Ny, Nc = 2, 2, 2
    L = Nx * Ny * Nc
    J = make_chimera_like(rng, Nx, Ny, Nc, field=False)
    J = tnax.round_Jij(J, 1.0)
    J = [j for j in J if j[2] != 0]
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=1.5, J=J)
    Eng = ins.search_ground_state(M=256, relative_P_cutoff=1e-14, Dmax=16)
    Emin, E = brute_force_min(J, L)
    # count only over states of ACTIVE spins; inactive spins do not
    # contribute and the solver does not count them
    nact = sum(len(ins.problem.ind[ny][nx]) for ny in range(Ny)
               for nx in range(Nx))
    expected_deg = int((np.abs(E - Emin) < 1e-9).sum()) // 2 ** (L - nact)
    assert Eng[0] == pytest.approx(Emin, abs=1e-9)
    assert ins.degeneracy == expected_deg


def test_spectrum_small_all_encodings():
    rng = np.random.default_rng(9)
    Nx, Ny, Nc = 2, 2, 2
    L = Nx * Ny * Nc
    J = make_chimera_like(rng, Nx, Ny, Nc)
    Emin, E = brute_force_min(J, L)
    dE = 2.0
    expected = np.sort(E[E <= Emin + dE])
    for ee in (1, 2, 3):
        ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
        ins.search_low_energy_spectrum(excitations_encoding=ee, M=256,
                                       relative_P_cutoff=1e-14, Dmax=16,
                                       max_dEng=dE)
        ins.decode_low_energy_states(max_dEng=dE, max_states=10000)
        assert len(ins.energy) == len(expected), f"ee={ee}"
        assert np.allclose(np.sort(ins.energy), expected, atol=1e-8)
        # decoded states re-score exactly
        assert np.allclose(energy_Jij(J, ins.binary_states()), ins.energy,
                           atol=1e-8)


def test_sampling_energy_consistency():
    rng = np.random.default_rng(4)
    J = make_chimera_like(rng, 2, 2, 2)
    ins = tnax.Solver(mode="Ising", Nx=2, Ny=2, Nc=2, beta=1, J=J)
    E = ins.gibbs_sampling(M=32, Dmax=8)
    assert len(E) == 32
    assert np.allclose(E, energy_Jij(J, ins.binary_states()), atol=1e-9)


def test_sampling_distribution():
    """Sampled frequencies must approach the Gibbs distribution."""
    rng = np.random.default_rng(12)
    J = make_chimera_like(rng, 2, 1, 2)
    L = 4
    ins = tnax.Solver(mode="Ising", Nx=2, Ny=1, Nc=2, beta=1, J=J)
    M = 4000
    E = ins.gibbs_sampling(M=M, Dmax=8)
    _, Eall = brute_force_min(J, L)
    p = np.exp(-1.0 * (Eall - Eall.min()))
    p /= p.sum()
    # empirical distribution over energies
    vals, counts = np.unique(np.round(E, 9), return_counts=True)
    emp = dict(zip(vals, counts / M))
    theo = {}
    for e, pi in zip(np.round(Eall, 9), p):
        theo[e] = theo.get(e, 0.0) + pi
    for v, f in emp.items():
        assert abs(f - theo[v]) < 0.05


def test_rmf_gs_brute_force():
    rng = np.random.default_rng(2)
    Nx, Ny, q = 3, 2, 3
    N = np.full((Ny, Nx), q)
    fun, fac = {}, {}
    k = 0
    for ny in range(Ny):
        for nx in range(Nx):
            fun[k] = rng.normal(size=q)
            fac[(ny, nx)] = k
            k += 1
            if nx + 1 < Nx:
                fun[k] = rng.normal(size=(q, q))
                fac[(ny, nx, ny, nx + 1)] = k
                k += 1
            if ny + 1 < Ny:
                fun[k] = rng.normal(size=(q, q))
                fac[(ny, nx, ny + 1, nx)] = k
                k += 1
    J = {"fun": fun, "fac": fac, "N": N, "Nx": Nx, "Ny": Ny}
    ins = tnax.Solver(mode="RMF", Nx=Nx, Ny=Ny, J=J, beta=3)
    Eng = ins.search_ground_state(M=128, relative_P_cutoff=1e-14, Dmax=8)
    best = min(energy_RMF(J, np.array([c]))[0]
               for c in itertools.product(range(q), repeat=Nx * Ny))
    assert Eng[0] == pytest.approx(best, abs=1e-9)


def test_checkpoint_resume(tmp_path):
    from tnax.search import ContractionContext, search_ground_state
    rng = np.random.default_rng(8)
    J = make_chimera_like(rng, 3, 3, 2)
    ins = tnax.Solver(mode="Ising", Nx=3, Ny=3, Nc=2, beta=2, J=J)
    ctx = ContractionContext(ins.problem, 2.0)
    full = search_ground_state(ctx, M=64, relative_P_cutoff=1e-12, Dmax=8)
    ck = str(tmp_path / "ck.npz")
    ctx2 = ContractionContext(ins.problem, 2.0)
    search_ground_state(ctx2, M=64, relative_P_cutoff=1e-12, Dmax=8,
                        checkpoint_path=ck, _stop_after_rows=2)
    ctx3 = ContractionContext(ins.problem, 2.0)
    res = search_ground_state(ctx3, M=64, relative_P_cutoff=1e-12, Dmax=8,
                              checkpoint_path=ck, resume=True)
    assert res.energy[0] == pytest.approx(full.energy[0], abs=1e-12)
    assert res.degeneracy == full.degeneracy
    assert np.array_equal(res.states, full.states)


def test_negative_probability_core_plumbing():
    """negative_probability_core: reported by host and device GS paths,
    never more negative than the raw flag (it is a masked min of the same
    per-branch statistic), and clean (>-0.5) on a well-conditioned small
    instance where the raw flag is clean too."""
    rng = np.random.default_rng(3)
    Nx, Ny, Nc = 2, 2, 2
    J = make_chimera_like(rng, Nx, Ny, Nc)
    for path in ("host", "device"):
        ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
        ins.search_ground_state(M=64, relative_P_cutoff=1e-6, Dmax=8,
                                path=path)
        core = ins.negative_probability_core
        raw = ins.negative_probability
        assert core <= 0.0
        assert core >= raw - 1e-12, (path, core, raw)
        assert core > -0.5

    # spectrum paths carry it too, and it round-trips through save/load
    import os
    import tempfile
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, beta=2, J=J)
    ins.search_low_energy_spectrum(excitations_encoding=1, M=64,
                                   relative_P_cutoff=1e-6, Dmax=8,
                                   max_dEng=1.0, path="device")
    assert hasattr(ins, "negative_probability_core")
    with tempfile.TemporaryDirectory() as td:
        fn = os.path.join(td, "res.npy")
        ins.save(fn)
        back = tnax.load(fn)
        assert back.negative_probability_core == \
            ins.negative_probability_core


def test_seeded_noise_reproducible():
    """np.random.seed + add_noise is reproducible (the reference uses the
    global legacy RNG, tnac4o/tnac4o.py:928-941); identical seeded runs
    must decode identical spectra."""
    rng = np.random.default_rng(11)
    J = make_chimera_like(rng, 2, 2, 4)

    def noisy():
        ins = tnax.Solver(mode="Ising", Nx=2, Ny=2, Nc=4, beta=2, J=J)
        np.random.seed(123)
        ins.add_noise(amplitude=1e-7)
        return ins

    from tnax import engine
    i1, i2 = noisy(), noisy()
    g1 = engine.pad_grid(i1.problem)
    g2 = engine.pad_grid(i2.problem)
    assert np.array_equal(g1.Es, g2.Es)
    assert np.array_equal(g1.Esl, g2.Esl)
