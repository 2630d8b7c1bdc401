"""Oracle-checked validation of the low-cap droplet fast path.

probe5 measured the cap shrink (L2048 warm 2.66 -> 2.32 s at
cand_factor=1; L512 fleet batch 5.52 -> 4.58 s at cand_factor=2) but
compared device f32-accumulated energies at 1e-6 — meaningless. This
reruns with the real contract: host-exact energy of the returned state
(tnax.energy_Jij) vs the reference groundstates table, across several
instances, plus the first-rotation-retry protocol on a miss.

Decision input for making a lower cap the droplet production default
(the cap only truncates the merge candidate set to its most probable
prefix; the rotation ladder already covers f32 misses).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tnax
from tnax import parallel

DROP = ("/root/reference/instances/Chimera_droplet_instances/"
        "chimera%d_spinglass_power/%03d.txt")


def load(L, i):
    return tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(DROP % (L, i))),
                          1 / 75)


def oracle(L):
    from conformance import droplet_oracle
    return droplet_oracle(L)


def exact_E(J, ins, states):
    ins.states = np.asarray(states)[None, :][:, ins.order]
    return float(tnax.energy_Jij(J, ins.binary_states())[0])


def l2048(cf):
    orc = oracle(2048)
    hits, times = 0, []
    for i in (1, 2, 3, 4, 5):
        J = load(2048, i)
        E = np.inf
        for rot in range(4):
            ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J,
                              beta=3)
            if rot:
                ins.rotate_graph(rot=rot)
            t0 = time.time()
            r = parallel.flagship_search_gs(ins, M=1024,
                                            relative_P_cutoff=1e-8,
                                            Dmax=32, cand_factor=cf)
            dt = time.time() - t0
            E = min(E, exact_E(J, ins, r["states"]))
            if rot == 0:
                times.append(dt)
            if abs(E - orc[i]) < 1e-4:
                break
        ok = abs(E - orc[i]) < 1e-4
        hits += ok
        print(json.dumps({"cfg": f"L2048 cf={cf}", "inst": i, "E": E,
                          "oracle": orc[i], "ok": bool(ok), "rot": rot,
                          "rot0_s": round(times[-1], 3)}), flush=True)
    print(json.dumps({"cfg": f"L2048 cf={cf}", "hits": f"{hits}/5",
                      "warm_rot0_s": round(min(times[1:]), 3)}),
          flush=True)


def fleet512(cf):
    orc = oracle(512)
    hits, n = 0, 0
    ts = []
    for lo in (1, 9, 17):
        J8 = [load(512, i) for i in range(lo, lo + 8)]
        solvers = [tnax.Solver(mode="Ising", Nx=8, Ny=8, Nc=8, J=J,
                               beta=3) for J in J8]
        t0 = time.time()
        rs = parallel.multi_flagship_search_gs(
            solvers, M=1024, relative_P_cutoff=1e-8, Dmax=32,
            cand_factor=cf)
        ts.append(time.time() - t0)
        for k, (J, ins, r) in enumerate(zip(J8, solvers, rs)):
            E = exact_E(J, ins, r["states"])
            ok = abs(E - orc[lo + k]) < 1e-4
            hits += ok
            n += 1
            if not ok:
                print(json.dumps({"cfg": f"L512 fleet cf={cf}",
                                  "inst": lo + k, "E": E,
                                  "oracle": orc[lo + k],
                                  "ok": False}), flush=True)
    print(json.dumps({"cfg": f"L512 fleet cf={cf}", "hits": f"{hits}/{n}",
                      "warm_batch_s": round(min(ts[1:]), 3)}), flush=True)


def main():
    import jax
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for cf in (1, 2):
        l2048(cf)
    fleet512(2)
    fleet512(1)


if __name__ == "__main__":
    main()
