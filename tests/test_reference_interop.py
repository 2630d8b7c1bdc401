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
