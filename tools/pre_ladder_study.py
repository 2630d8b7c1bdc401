"""Preconditioning-ladder depth study at the flagship operating point.

The balancing ladder (reference `tnac4o/tnac4o.py:342-379`: betas
beta*2^(n-steps), D=8 each) costs ~1.0 s of the ~2.5 s L2048 flagship.
The two-direction boundary builds of each rung are already fused
(`engine.build_rho_both`), so the one untried lever is ladder DEPTH:
pre_steps=1 runs a single rung at beta/2 instead of [beta/4, beta/2].

This measures, over the first N chimera-2048 droplet instances, the
first-pass (rot=0) oracle match rate and per-instance warm wall-clock at
pre_steps in {2, 1} — the quality/speed curve VERDICT r3 asked for. A
default change is only justified if the match rate is neutral; misses
feed the existing escalation ladder either way.

Output: one JSON line per (pre_steps, instance) + per-config summary.
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


def oracle(L=2048):
    out = {}
    with open(os.path.join(
            INST, "Chimera_droplet_instances",
            f"chimera{L}_spinglass_power", "groundstates_otn2d.txt")) as f:
        for line in f:
            p = line.split()
            if len(p) >= 3 and ":" in line:
                out[int(p[0].split(".")[0])] = float(p[2])
    return out


def main():
    n = int(os.environ.get("TNAX_STUDY_N", "20"))
    ps_list = tuple(int(x) for x in
                    os.environ.get("TNAX_STUDY_PS", "2,1").split(","))
    orc = oracle()
    for ps in ps_list:
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
                                            Dmax=32, pre_steps=ps)
            dt = time.time() - t0
            ins.states = np.asarray(r["states"])[None, :][:, ins.order]
            E = float(tnax.energy_Jij(J, ins.binary_states())[0])
            ok = abs(E - orc[k]) < 1e-4
            hits += ok
            if k > 1:                   # instance 1 pays the compile
                times.append(dt)
            print(json.dumps({"pre_steps": ps, "instance": k,
                              "ok": bool(ok), "s": round(dt, 3)}),
                  flush=True)
        print(json.dumps({"pre_steps": ps,
                          "match": f"{hits}/{n}",
                          "warm_s_median": round(float(np.median(times)), 3),
                          "warm_s_min": round(float(np.min(times)), 3)}),
              flush=True)


if __name__ == "__main__":
    main()
