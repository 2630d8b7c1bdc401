"""Device-record spectrum path vs. the host-orchestrated path.

The device path (`tnax.spectrum.device_search_spectrum`) makes every beam
decision on device and emits per-site decision records the host replays; on
CPU/f64 the two paths must agree on the golden spectrum (31 states below
dE=1 for chimera-128 instance 1; reference `examples/test_examples.py:59-104`).
"""

import os

import numpy as np
import pytest

import tnax

INST = "/root/reference/instances"
CH128 = os.path.join(
    INST, "Chimera_droplet_instances/chimera128_spinglass_power/001.txt")

pytestmark = pytest.mark.skipif(not os.path.exists(CH128),
                                reason="reference instances not available")


def _solve(path, ee, rot=0):
    J = tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(CH128)), 1 / 75)
    ins = tnax.Solver(mode="Ising", Nx=4, Ny=4, Nc=8, J=J, beta=3)
    if rot:
        ins.rotate_graph(rot=rot)
    if ee > 1:
        np.random.seed(7)
        ins.add_noise(amplitude=1e-7)
    ins.search_low_energy_spectrum(excitations_encoding=ee, M=1024,
                                   relative_P_cutoff=1e-8, Dmax=16,
                                   max_dEng=1.0, path=path)
    ins.decode_low_energy_states(max_dEng=1.0)
    return ins, J


@pytest.mark.parametrize("ee,rot", [(1, 0), (2, 1), (3, 2)])
def test_device_spectrum_golden(ee, rot):
    ins, J = _solve("device", ee, rot)
    assert len(ins.energy) == 31
    assert abs(ins.energy[0] + 210.93333333) < 1e-5
    err = np.max(np.abs(tnax.energy_Jij(J, ins.binary_states())
                        - ins.energy))
    assert err < 1e-4


def test_device_matches_host_spectrum():
    dev, _ = _solve("device", 1)
    host, _ = _solve("host", 1)
    assert len(dev.energy) == len(host.energy)
    assert np.max(np.abs(np.sort(dev.energy) - np.sort(host.energy))) < 1e-9
    assert dev.degeneracy == host.degeneracy


def test_device_spectrum_save_load_decode(tmp_path):
    """Device-path droplet trees round-trip through the reference .npy
    artifact format and decode identically after reload."""
    ins, J = _solve("device", 2)
    f = str(tmp_path / "sol.npy")
    ins.save(f)
    ins.decode_low_energy_states(max_dEng=1.0)
    re = tnax.load(f)
    re.decode_low_energy_states(max_dEng=1.0)
    assert len(re.energy) == len(ins.energy)
    assert np.max(np.abs(np.sort(re.energy) - np.sort(ins.energy))) < 1e-12


@pytest.mark.parametrize("ee", [1, 2, 3])
def test_device_spectrum_rmf_golden(ee):
    """RMF mode through the device-record path: 26 states below dE=3.1 for
    the minimal 3x5 Potts model (reference `test_examples.py:107-136`)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "examples"))
    from e05_minimal_rmf import build_model
    J = build_model()
    ins = tnax.Solver(mode="RMF", Nx=5, Ny=3, J=J, beta=4)
    if ee > 1:
        np.random.seed(0)
        ins.add_noise(amplitude=1e-7)
    ins.search_low_energy_spectrum(excitations_encoding=ee, M=1024,
                                   relative_P_cutoff=1e-12, Dmax=32,
                                   max_dEng=3.1, path="device")
    ins.decode_low_energy_states(max_dEng=3.1, max_states=100)
    assert len(ins.energy) == 26
    err = np.max(np.abs(tnax.energy_RMF(J, ins.states) - ins.energy))
    assert err < 1e-4    # add_noise(1e-7) band, reference test_examples.py:134


@pytest.mark.parametrize("ee", [1, 2])
def test_fleet_spectrum_matches_single(ee):
    """`multi_search_spectrum` (one vmapped dispatch for B instances) must
    reproduce each instance's single-dispatch device spectrum exactly:
    same decoded energies AND identical droplet shape dictionaries
    (VERDICT r2 missing item 1 / next-round task 2 — fleet spectrum)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_search_small import make_chimera_like
    from tnax import spectrum

    def build(i):
        J = make_chimera_like(np.random.default_rng(i), 2, 2, 4)
        ins = tnax.Solver(mode="Ising", Nx=2, Ny=2, Nc=4, beta=2, J=J)
        return ins

    B = 3
    singles = []
    for i in range(B):
        ins = build(i)
        ins.search_low_energy_spectrum(excitations_encoding=ee, M=64,
                                       relative_P_cutoff=1e-10, Dmax=8,
                                       max_dEng=1.5, path="device",
                                       auto_grow=False)
        ins.decode_low_energy_states(max_dEng=1.5, max_states=256)
        singles.append(ins)

    inss = [build(i) for i in range(B)]
    ctxs = [ins._context() for ins in inss]
    rs = spectrum.multi_search_spectrum(inss, ctxs, ee, M=64,
                                        relative_P_cutoff=1e-10, Dmax=8,
                                        max_dEng=1.5)
    for ins, r, single in zip(inss, rs, singles):
        ins.energy = r.energy
        ins.probability = r.probability
        ins.degeneracy = r.degeneracy
        ins.states = r.states[:, ins.order]
        ins.merge_overflow = r.merge_overflow
        ins.decode_low_energy_states(max_dEng=1.5, max_states=256)
        assert len(ins.energy) == len(single.energy)
        assert np.max(np.abs(ins.energy - single.energy)) < 1e-12
        assert np.array_equal(ins.binary_states(), single.binary_states())
        assert set(map(lambda v: (v[0].tobytes(), v[1].tobytes()),
                       ins.d.values())) \
            == set(map(lambda v: (v[0].tobytes(), v[1].tobytes()),
                       single.d.values()))


def test_cap_overflow_flag_and_auto_grow():
    """A deliberately tiny candidate cap trips merge_overflow; auto_grow
    re-runs with a sufficient cap and yields the complete droplet tree
    (same decoded spectrum as an uncapped run)."""
    J = tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(CH128)), 1 / 75)

    def run(auto_grow, cand_factor):
        ins = tnax.Solver(mode="Ising", Nx=4, Ny=4, Nc=8, J=J, beta=3)
        ins.search_low_energy_spectrum(
            excitations_encoding=1, M=64, relative_P_cutoff=1e-8, Dmax=16,
            max_dEng=1.0, path="device", cand_factor=cand_factor,
            auto_grow=auto_grow)
        ins.decode_low_energy_states(max_dEng=1.0)
        return ins, ins.energy

    capped, _ = run(auto_grow=False, cand_factor=1)
    assert capped.merge_overflow > 0         # flag surfaced, not just logged

    grown, Eg = run(auto_grow=True, cand_factor=1)
    assert grown.merge_overflow == 0
    full, Ef = run(auto_grow=False, cand_factor=None)  # uncapped M*Np
    assert full.merge_overflow == 0
    assert len(Eg) == len(Ef)
    assert np.allclose(np.sort(Eg), np.sort(Ef), atol=1e-9)


def test_pull_cap_overflow_and_recovery():
    """Blocks whose 8 active spins expose only ONE boundary spin map 256
    block states onto 2x2 boundary keys, so nearly every candidate merges
    into a kept slot: the compacted record's pull cap (P = max(16M, C/8)
    when C < M*Np) overflows via n_valid even though the merge cap C does
    not. auto_grow must escalate to the full expansion (where compaction
    is disabled) and deliver a complete tree."""
    rng = np.random.default_rng(2)
    Nx = Ny = 2
    Nc = 8
    J = []
    for ny in range(Ny):
        for nx in range(Nx):
            b = Nc * (Nx * ny + nx)
            for a in range(Nc):        # intra: keep all 8 spins active
                for c in range(a + 1, Nc):
                    J.append([b + a, b + c, float(rng.normal()) * 0.1])
            if nx + 1 < Nx:            # inter: spin 0 only -> leg dim 2
                J.append([b, Nc * (Nx * ny + nx + 1), 0.1])
            if ny + 1 < Ny:
                J.append([b, Nc * (Nx * (ny + 1) + nx), 0.1])

    def run(cand_factor, auto_grow):
        ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=0.5)
        ins.search_low_energy_spectrum(
            excitations_encoding=1, M=4, relative_P_cutoff=1e-12, Dmax=8,
            max_dEng=2.0, path="device", cand_factor=cand_factor,
            auto_grow=auto_grow)
        ins.decode_low_energy_states(max_dEng=2.0)
        return ins

    capped = run(cand_factor=64, auto_grow=False)   # C=256 < M*Np, P=64
    assert capped.merge_overflow > 0                # n_valid > P flagged

    grown = run(cand_factor=64, auto_grow=True)
    assert grown.merge_overflow == 0
    full = run(cand_factor=None, auto_grow=False)   # direct full expansion
    assert full.merge_overflow == 0
    assert len(grown.energy) == len(full.energy)
    assert np.allclose(np.sort(grown.energy), np.sort(full.energy),
                       atol=1e-9)
