"""Golden-value integration tests on the reference's shipped instances —
the acceptance gate from the reference CI (reference
`examples/test_examples.py`, values documented in BASELINE.md)."""

import os

import numpy as np
import pytest

import tnax

INST = "/root/reference/instances"
CH128 = os.path.join(
    INST, "Chimera_droplet_instances/chimera128_spinglass_power/001.txt")
J124 = os.path.join(INST, "Chimera_J124/C=8_J124/001.txt")

pytestmark = pytest.mark.skipif(not os.path.exists(CH128),
                                reason="reference instances not available")


def chimera128():
    J = tnax.load_Jij(CH128)
    return tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)


def test_e01_ground_state():
    """GS energy of chimera-128 droplet instance 1 == -210.93333333
    (reference `test_examples.py:24-33`)."""
    expected = -210.93333333
    J = chimera128()

    ins = tnax.Solver(mode="Ising", Nx=4, Ny=4, Nc=8, J=J, beta=3)
    ins.precondition(mode="balancing")
    Eng = ins.search_ground_state(M=1024, relative_P_cutoff=1e-8, Dmax=8)
    assert abs(Eng[0] - expected) < 1e-5

    ins = tnax.Solver(mode="Ising", Nx=4, Ny=4, Nc=8, J=J, beta=3)
    ins.rotate_graph(rot=3)
    Eng = ins.search_ground_state(M=1024, relative_P_cutoff=1e-8, Dmax=8)
    assert abs(Eng[0] - expected) < 1e-5


def test_e02_sampling_consistency():
    """Sampling returns M states whose energies match an independent
    recomputation (reference `test_examples.py:36-56`)."""
    J = chimera128()
    M = 128
    for rot in (0, 1):
        ins = tnax.Solver(mode="Ising", Nx=4, Ny=4, Nc=8, J=J, beta=3)
        if rot:
            ins.rotate_graph(rot=rot)
        E = ins.gibbs_sampling(M=M, Dmax=8)
        assert len(ins.states) == M
        err = np.max(np.abs(E - tnax.energy_Jij(J, ins.binary_states())))
        assert err < 1e-6


def test_e03_spectrum_31_states():
    """31 states below dE=1 for all encodings/rotations (reference
    `test_examples.py:59-104`)."""
    J = chimera128()
    energies = []
    for ee, rot in [(1, 0), (1, 1), (2, 2), (3, 3)]:
        ins = tnax.Solver(mode="Ising", Nx=4, Ny=4, Nc=8, J=J, beta=3)
        if rot:
            ins.rotate_graph(rot=rot)
        if ee > 1:
            ins.add_noise(amplitude=1e-7)
        ins.search_low_energy_spectrum(excitations_encoding=ee, M=1024,
                                       relative_P_cutoff=1e-8, Dmax=16,
                                       max_dEng=1.0)
        ins.decode_low_energy_states(max_dEng=1.0)
        assert len(ins.energy) == 31, f"ee={ee} rot={rot}"
        err = np.max(np.abs(tnax.energy_Jij(J, ins.binary_states())
                            - ins.energy))
        assert err < 1e-4
        energies.append(ins.energy)
    for e in energies[1:]:
        assert np.max(np.abs(e - energies[0])) < 1e-4


def _minimal_rmf_model():
    """The reference's 3x5 Potts-like RMF (reference
    `examples/e05_minimal_RMF.py:32-57`)."""
    Nx, Ny = 5, 3
    N = np.zeros((Ny, Nx), dtype=int) + 3
    fun = {1: np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]]),
           2: np.array([-1.5, 0, 1.5]),
           3: np.array([1.25, 0, -1.25])}
    fac = {}
    for ny in range(Ny):
        for nx in range(Nx - 1):
            fac[(ny, nx, ny, nx + 1)] = 1
    for ny in range(Ny - 1):
        for nx in range(Nx):
            fac[(ny, nx, ny + 1, nx)] = 1
    for nx in range(Nx):
        fac[(0, nx)] = 2
        fac[(1, nx)] = 3
        fac[(2, nx)] = 2
    return {"fun": fun, "fac": fac, "N": N, "Nx": Nx, "Ny": Ny}


def test_e05_rmf_spectrum_26_states():
    """26 states below dE=3.1 for the minimal RMF across encodings AND
    rotations on the host path, decoded states re-scored with energy_RMF
    (reference `test_examples.py:107-136`; VERDICT r2 missing item 2 —
    the host RMF spectrum x rotation composition was implemented but
    untested)."""
    J = _minimal_rmf_model()
    energies, states_E = [], []
    for ee, rot in [(1, 0), (1, 1), (2, 2), (3, 3)]:
        ins = tnax.Solver(mode="RMF", Nx=5, Ny=3, J=J, beta=4)
        if rot:
            ins.rotate_graph(rot=rot)
        if ee > 1:
            ins.add_noise(amplitude=1e-7)
        ins.search_low_energy_spectrum(excitations_encoding=ee, M=1024,
                                       relative_P_cutoff=1e-12, Dmax=32,
                                       max_dEng=3.1)
        ins.decode_low_energy_states(max_dEng=3.1, max_states=100)
        assert len(ins.energy) == 26, f"ee={ee} rot={rot}"
        energies.append(np.sort(ins.energy))
        states_E.append(np.sort(tnax.energy_RMF(J, ins.states)))
    for e, se in zip(energies, states_E):
        assert np.max(np.abs(e - energies[0])) < 1e-4
        assert np.max(np.abs(se - states_E[0])) < 1e-4


def test_e06_j124_degeneracy():
    """Exact GS energy -2309 with degeneracy 1152 (reference
    `test_examples.py:139-147`)."""
    J = tnax.Jij_f2p(tnax.load_Jij(J124))
    ins = tnax.Solver(mode="Ising", Nx=8, Ny=8, Nc=8, J=J, beta=0.75)
    ins.precondition(mode="balancing")
    Eng = ins.search_ground_state(M=4096, relative_P_cutoff=1e-8, Dmax=8)
    assert abs(Eng[0] - (-2309)) < 1e-12
    assert ins.degeneracy == 1152


def test_e03_e04_save_load_roundtrip(tmp_path):
    """Search -> save -> load -> decode, the reference's e03/e04 workflow
    (reference `.github/workflows/test.yml:44-45`)."""
    J = chimera128()
    ins = tnax.Solver(mode="Ising", Nx=4, Ny=4, Nc=8, J=J, beta=3)
    ins.search_low_energy_spectrum(excitations_encoding=2, M=1024,
                                   relative_P_cutoff=1e-8, Dmax=16,
                                   max_dEng=1.0)
    f = str(tmp_path / "sol.npy")
    ins.save(f)
    ins2 = tnax.load(f)
    ins2.decode_low_energy_states(max_dEng=1.0)
    ins.decode_low_energy_states(max_dEng=1.0)
    assert len(ins2.energy) == len(ins.energy)
    assert np.allclose(ins2.energy, ins.energy)
    assert np.array_equal(ins2.binary_states(), ins.binary_states())


def test_minus_Jij_max_energy_oracle():
    """minus_Jij flips the problem: the GS of -J is the max-energy state,
    shipped per instance in max_energy_otn2d.txt (SURVEY.md section 6)."""
    path = os.path.join(
        INST, "Chimera_droplet_instances/chimera128_spinglass_power/"
              "max_energy_otn2d.txt")
    with open(path) as f:
        expected = float(f.readline().split()[2])
    J = chimera128()
    ins = tnax.Solver(mode="Ising", Nx=4, Ny=4, Nc=8,
                      J=tnax.minus_Jij(J), beta=3)
    ins.precondition(mode="balancing")
    Eng = ins.search_ground_state(M=1024, relative_P_cutoff=1e-8, Dmax=8)
    assert abs(-Eng[0] - expected) < 1e-4
