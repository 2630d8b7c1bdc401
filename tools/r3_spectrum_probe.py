"""Round-3 spectrum probe (ONE TPU process):

1. Op microbench at L2048 scan shapes (tools/r3_microbench.py inline).
2. L2048 ee=2 complete-tree spectrum: device A/B over cand_factor
   {32, 64, 128} (overflow counts decide the smallest complete cap) and
   a cProfile of the warm host replay (top cumtime entries).
3. J124 C16 fused fleet at group=1 (4-rotation batch): 2 batches.

JSON lines to stdout; cProfile summary to stderr.
"""

import cProfile
import io
import json
import logging
import os
import pstats
import sys
import time

os.environ["TNAX_SPECTRUM_TIMING"] = "1"
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tnax
from tnax import parallel

logging.basicConfig(level="INFO")

DROP = ("/root/reference/instances/Chimera_droplet_instances/"
        "chimera%d_spinglass_power/%03d.txt")


def load(L, i):
    return tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(DROP % (L, i))),
                          1 / 75)


def spectrum_once(J, cand_factor, profile=False):
    ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J, beta=3)
    np.random.seed(7)
    ins.add_noise(amplitude=1e-7)
    ins.precondition(mode="balancing")
    t0 = time.time()
    pr = cProfile.Profile() if profile else None
    if pr:
        pr.enable()
    ins.search_low_energy_spectrum(excitations_encoding=2, M=1024,
                                   relative_P_cutoff=1e-8, Dmax=32,
                                   max_dEng=1.0, path="device",
                                   cand_factor=cand_factor,
                                   auto_grow=False)
    if pr:
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(30)
        print(s.getvalue()[:6000], file=sys.stderr, flush=True)
    dt = time.time() - t0
    ins.decode_low_energy_states(max_dEng=1.0)
    return dict(s=round(dt, 2), states=len(ins.energy),
                overflow=int(ins.merge_overflow))


def main():
    stages = os.environ.get("R3SP_STAGES", "micro,spectrum,j124").split(",")

    if "micro" in stages:
        import r3_microbench
        r3_microbench.main()

    if "spectrum" in stages:
        J = load(2048, 1)
        out = {"cold128": spectrum_once(J, 128)}
        out["warm128_prof"] = spectrum_once(J, 128, profile=True)
        for cf in (64, 32):
            out["cf%d" % cf] = spectrum_once(J, cf)
        print(json.dumps(dict(stage="spectrum_ab", **out)), flush=True)

    if "j124" in stages:
        J124 = "/root/reference/instances/Chimera_J124/C=16_J124/%03d.txt"
        times = []
        for k in (1, 2):
            J = tnax.Jij_f2p(tnax.load_Jij(J124 % k))
            t0 = time.time()
            solvers = []
            for rot in range(4):
                ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J,
                                  beta=0.75)
                if rot:
                    ins.rotate_graph(rot=rot)
                solvers.append(ins)
            rs = parallel.multi_flagship_search_gs(
                solvers, M=4096, relative_P_cutoff=1e-8, Dmax=48)
            bE, bD = np.inf, 0
            for ins, r in zip(solvers, rs):
                ins.states = np.asarray(r["states"])[None, :][:, ins.order]
                E = float(tnax.energy_Jij(J, ins.binary_states())[0])
                if E < bE - 1e-9:
                    bE, bD = E, r["degeneracy"]
                elif abs(E - bE) < 1e-9:
                    bD = max(bD, r["degeneracy"])
            times.append(dict(instance=k, s=round(time.time() - t0, 2),
                              E=bE, deg=bD))
        print(json.dumps(dict(stage="j124_C16_group1", runs=times)),
              flush=True)


if __name__ == "__main__":
    main()
