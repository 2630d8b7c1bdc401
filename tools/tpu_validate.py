"""End-to-end TPU validation battery (single process to amortize compiles).

Runs every workflow on the accelerator and checks against reference ground
truth: GS (host + device paths), sampling, spectrum (all encodings), J124
degeneracy. Run overnight-style; see .claude/skills/verify/SKILL.md for the
TPU session discipline (one process at a time, ~10-25 min compile).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tnax
from tnax import parallel

INST = os.environ.get("TNAX_INSTANCES", "/root/reference/instances")
REF = {128: -210.93333333, 512: -846.96, 1152: -1881.22666667,
       2048: -3336.77333333}
SHAPES = {128: (4, 4, 8), 512: (8, 8, 8), 1152: (12, 12, 8),
          2048: (16, 16, 8)}


def load(L, instance=1):
    J = tnax.load_Jij(os.path.join(
        INST, "Chimera_droplet_instances",
        f"chimera{L}_spinglass_power", "%03d.txt" % instance))
    return tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)
    failures = []

    def check(name, ok, detail=""):
        print(f"{'PASS' if ok else 'FAIL'} {name} {detail}", flush=True)
        if not ok:
            failures.append(name)

    # GS both paths, L=512
    J = load(512)
    ins = tnax.Solver(mode="Ising", Nx=8, Ny=8, Nc=8, J=J, beta=3)
    ins.precondition(mode="balancing")
    t0 = time.time()
    E = ins.search_ground_state(M=1024, relative_P_cutoff=1e-8, Dmax=32)
    check("GS host L512", abs(E[0] - REF[512]) < 1e-4,
          f"E={E[0]:.4f} {time.time()-t0:.1f}s")
    t0 = time.time()
    E = ins.search_ground_state(M=1024, relative_P_cutoff=1e-8, Dmax=32,
                                path="device")
    check("GS device L512", abs(E[0] - REF[512]) < 1e-4,
          f"E={E[0]:.4f} {time.time()-t0:.1f}s")

    # sampling
    E = ins.gibbs_sampling(M=64, Dmax=32, path="device", seed=1)
    err = np.max(np.abs(E - tnax.energy_Jij(J, ins.binary_states())))
    check("sampling device L512", err < 1e-9, f"err={err:.1e}")

    # spectrum all encodings, L=128
    J = load(128)
    for ee, rot in [(1, 0), (2, 2), (3, 3)]:
        ins = tnax.Solver(mode="Ising", Nx=4, Ny=4, Nc=8, J=J, beta=3)
        if rot:
            ins.rotate_graph(rot=rot)
        if ee > 1:
            ins.add_noise(amplitude=1e-7)
        ins.search_low_energy_spectrum(excitations_encoding=ee, M=1024,
                                       relative_P_cutoff=1e-8, Dmax=16,
                                       max_dEng=1.0)
        ins.decode_low_energy_states(max_dEng=1.0)
        check(f"spectrum ee={ee}", len(ins.energy) == 31,
              f"n={len(ins.energy)}")

    # J124 degeneracy
    J = tnax.Jij_f2p(tnax.load_Jij(os.path.join(
        INST, "Chimera_J124", "C=8_J124", "001.txt")))
    ins = tnax.Solver(mode="Ising", Nx=8, Ny=8, Nc=8, J=J, beta=0.75)
    ins.precondition(mode="balancing")
    E = ins.search_ground_state(M=4096, relative_P_cutoff=1e-8, Dmax=8)
    check("J124 degeneracy", abs(E[0] + 2309) < 1e-9
          and ins.degeneracy == 1152, f"E={E[0]} deg={ins.degeneracy}")

    print(("ALL PASS" if not failures else f"FAILURES: {failures}"),
          flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
