"""Boundary-polish depth study at the flagship operating point.

The boundary build (~0.77 s of the ~1.81 s flagship) spends ~2/3 in the
variational polish after the rsvd zip-up (results/r4_boundary_phases.jsonl).
max_sweeps (search boundary) and pre_sweeps (ladder boundaries) are
already knobs of flagship_search_gs. This measures warm wall-clock and
rot=0 oracle match over the first N L2048 instances for
(max_sweeps, pre_sweeps) in {(20,20) default, (2,20), (1,20), (0,20),
(0,0)} — quality gate like the pre_steps study: a default change needs
match-rate neutrality.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tnax
from tnax import parallel

INST = os.environ.get("TNAX_INSTANCES", "/root/reference/instances")


def oracle():
    out = {}
    with open(os.path.join(
            INST, "Chimera_droplet_instances",
            "chimera2048_spinglass_power", "groundstates_otn2d.txt")) as f:
        for line in f:
            p = line.split()
            if len(p) >= 3 and ":" in line:
                out[int(p[0].split(".")[0])] = float(p[2])
    return out


def main():
    n = int(os.environ.get("TNAX_STUDY_N", "20"))
    orc = oracle()
    import ast
    cfgs = ast.literal_eval(os.environ.get(
        "TNAX_POLISH_CFGS",
        "((20, 20), (2, 20), (1, 20), (0, 20), (0, 0))"))
    for ms, pms in cfgs:
        times, hits = [], 0
        for k in range(1, n + 1):
            f = os.path.join(INST, "Chimera_droplet_instances",
                             "chimera2048_spinglass_power", "%03d.txt" % k)
            J = tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(f)), 1 / 75)
            ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J,
                              beta=3)
            t0 = time.time()
            r = parallel.flagship_search_gs(ins, M=1024,
                                            relative_P_cutoff=1e-8,
                                            Dmax=32, max_sweeps=ms,
                                            pre_sweeps=pms)
            dt = time.time() - t0
            ins.states = np.asarray(r["states"])[None, :][:, ins.order]
            E = float(tnax.energy_Jij(J, ins.binary_states())[0])
            ok = abs(E - orc[k]) < 1e-4
            hits += ok
            if k > 1:
                times.append(dt)
            print(json.dumps({"max_sweeps": ms, "pre_sweeps": pms,
                              "instance": k, "ok": bool(ok),
                              "s": round(dt, 3)}), flush=True)
        print(json.dumps({"max_sweeps": ms, "pre_sweeps": pms,
                          "match": f"{hits}/{n}",
                          "warm_s_median": round(float(np.median(times)), 3),
                          "warm_s_min": round(float(np.min(times)), 3)}),
              flush=True)


if __name__ == "__main__":
    main()
