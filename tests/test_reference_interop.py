"""Cross-implementation interop: tnax must load result files written by the
reference implementation (and vice versa the formats coincide by
construction, `tnax.solver.Solver.save`)."""

import os
import subprocess
import sys

import numpy as np
import pytest

import tnax

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not available")


@pytest.mark.slow
def test_load_reference_written_spectrum(tmp_path):
    """Run the reference's spectrum search, save, load with tnax, decode."""
    out = str(tmp_path / "refsol.npy")
    script = f"""
import sys
sys.path.insert(0, {REF!r})
import logging; logging.disable(logging.CRITICAL)
import tnac4o
J = tnac4o.load_Jij({REF!r} + '/instances/Chimera_droplet_instances/'
                    'chimera128_spinglass_power/001.txt')
J = tnac4o.round_Jij(tnac4o.Jij_f2p(J), 1/75)
ins = tnac4o.tnac4o(mode='Ising', Nx=4, Ny=4, Nc=8, J=J, beta=3)
ins.search_low_energy_spectrum(excitations_encoding=1, M=1024,
                               relative_P_cutoff=1e-8, Dmax=16, max_dEng=1.)
ins.save({out!r})
"""
    subprocess.run([sys.executable, "-c", script], check=True,
                   capture_output=True, timeout=900)
    ins = tnax.load(out)
    ins.decode_low_energy_states(max_dEng=1.0)
    assert len(ins.energy) == 31
    J = tnax.load_Jij(
        REF + "/instances/Chimera_droplet_instances/"
              "chimera128_spinglass_power/001.txt")
    J = tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)
    err = np.max(np.abs(tnax.energy_Jij(J, ins.binary_states())
                        - ins.energy))
    assert err < 1e-4


@pytest.mark.slow
def test_differential_random_asymmetric_lattice(tmp_path):
    """Differential test on a random ASYMMETRIC lattice (Ny=3 x Nx=5,
    Nc=4): the reference's decoded spectrum (run in-process from
    /root/reference) must match tnax's state for state and energy for
    energy — coverage beyond the square chimera goldens."""
    rng = np.random.default_rng(21)
    Ny, Nx, Nc = 3, 5, 4
    J = []
    for ny in range(Ny):
        for nx in range(Nx):
            base = (ny * Nx + nx) * Nc
            for a in range(Nc):
                for b in range(a, Nc):
                    if a == b or rng.random() < 0.6:
                        J.append([base + a, base + b,
                                  float(rng.integers(-4, 5)) / 2])
            if nx + 1 < Nx:
                for a in range(Nc):
                    if rng.random() < 0.5:
                        J.append([base + a, base + Nc + a,
                                  float(rng.integers(-4, 5)) / 2])
            if ny + 1 < Ny:
                for a in range(Nc):
                    if rng.random() < 0.5:
                        J.append([base + a, base + Nx * Nc + a,
                                  float(rng.integers(-4, 5)) / 2])
    out = str(tmp_path / "ref_asym.npy")
    script = f"""
import sys
sys.path.insert(0, {REF!r})
import logging; logging.disable(logging.CRITICAL)
import tnac4o
J = {J!r}
ins = tnac4o.tnac4o(mode='Ising', Nx={Nx}, Ny={Ny}, Nc={Nc}, J=J, beta=2)
ins.search_low_energy_spectrum(excitations_encoding=1, M=256,
                               relative_P_cutoff=1e-10, Dmax=16,
                               max_dEng=1.5)
ins.save({out!r})
"""
    subprocess.run([sys.executable, "-c", script], check=True,
                   capture_output=True, timeout=900)
    ref = tnax.load(out)
    ref.decode_low_energy_states(max_dEng=1.5)

    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=2)
    ins.search_low_energy_spectrum(excitations_encoding=1, M=256,
                                   relative_P_cutoff=1e-10, Dmax=16,
                                   max_dEng=1.5)
    ins.decode_low_energy_states(max_dEng=1.5)

    assert len(ins.energy) == len(ref.energy)
    assert np.allclose(np.sort(ins.energy), np.sort(ref.energy),
                       atol=1e-8)
    sref = {bytes(s.astype(np.int8)) for s in ref.binary_states()}
    stn = {bytes(s.astype(np.int8)) for s in ins.binary_states()}
    assert sref == stn


@pytest.mark.slow
def test_differential_rotation_asymmetric(tmp_path):
    """Rotating a NON-SQUARE lattice (Nx != Ny) must reproduce the
    reference exactly — including the reference's own quirk: for ODD
    rotations of a non-square lattice the reference's rotation math
    reports an optimum that its decoded state does not achieve
    (measured on the reference itself: rot 1 reports -50, decodes -47;
    rot 0/2 are consistent at the true optimum -67). tnax mirrors the
    reported values bit-for-bit; rot=2 (180 degrees) is asserted fully
    consistent."""
    rng = np.random.default_rng(22)
    Ny, Nx, Nc = 2, 4, 4
    # off-diagonal couplings only: the reference's search also drops
    # i==i field terms that its own energy_Jij counts
    J = []
    for ny in range(Ny):
        for nx in range(Nx):
            base = (ny * Nx + nx) * Nc
            for a in range(Nc):
                for b in range(a + 1, Nc):
                    J.append([base + a, base + b,
                              float(rng.integers(-2, 3))])
            if nx + 1 < Nx:
                for a in range(Nc):
                    J.append([base + a, base + Nc + a,
                              float(rng.integers(-2, 3))])
            if ny + 1 < Ny:
                for a in range(Nc):
                    J.append([base + a, base + Nx * Nc + a,
                              float(rng.integers(-2, 3))])
    J = [j for j in J if j[2] != 0.0]
    out = str(tmp_path / "ref_rot.npy")
    script = f"""
import sys
sys.path.insert(0, {REF!r})
import logging; logging.disable(logging.CRITICAL)
import json
import numpy as np
import tnac4o
res = {{}}
for rot in (1, 2):
    ins = tnac4o.tnac4o(mode='Ising', Nx={Nx}, Ny={Ny}, Nc={Nc},
                        J={J!r}, beta=2)
    ins.rotate_graph(rot=rot)
    ins.search_ground_state(M=128, relative_P_cutoff=1e-10, Dmax=16)
    res[rot] = [float(np.ravel(ins.energy)[0]),
                int(np.ravel(ins.degeneracy)[0]),
                float(tnac4o.energy_Jij({J!r},
                                        ins.binary_states()[:1])[0])]
print(json.dumps(res))
"""
    r = subprocess.run([sys.executable, "-c", script], check=True,
                       capture_output=True, text=True, timeout=900)
    import json
    ref = {int(k): v for k, v in json.loads(r.stdout).items()}

    for rot in (1, 2):
        ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=2)
        ins.rotate_graph(rot=rot)
        ins.search_ground_state(M=128, relative_P_cutoff=1e-10, Dmax=16)
        E_rep = float(ins.energy[0])
        deg = int(np.ravel(ins.degeneracy)[0])
        E_dec = float(tnax.energy_Jij(J, ins.binary_states()[:1])[0])
        assert abs(E_rep - ref[rot][0]) < 1e-8     # reported == reference
        assert deg == ref[rot][1]
        if rot == 2:
            # 180-degree rotation is well-defined for non-square
            # lattices: reported == decoded == reference
            assert abs(E_dec - E_rep) < 1e-8
            assert abs(E_dec - ref[rot][2]) < 1e-8
