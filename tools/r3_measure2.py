"""Round-3 measurement session 2 (after lane-packed boundary scans and
the inlined replay overlap filter):

1. L2048 fused flagship cold + 2 warm.
2. L2048 ee=2 complete-tree spectrum at cand_factor=64 (smallest
   complete cap measured) cold + warm, with phase split.
3. J124 C16 fused fleet at group=2 (the config that OOMed at 16.1G
   before lane packing): 2 batches of 8.
4. L512 fused fleet batch-8: compile + 2 warm batches.
"""

import json
import logging
import os
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
J124 = "/root/reference/instances/Chimera_J124/C=16_J124/%03d.txt"


def load(L, i):
    return tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(DROP % (L, i))),
                          1 / 75)


def main():
    stages = os.environ.get(
        "R3M2_STAGES", "flagship,spectrum,j124,fleet").split(",")

    if "flagship" in stages:
        J = load(2048, 1)
        out = {}
        for tag in ("cold", "warm1", "warm2"):
            ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J,
                              beta=3)
            t0 = time.time()
            r = parallel.flagship_search_gs(ins, M=1024,
                                            relative_P_cutoff=1e-8,
                                            Dmax=32)
            ins.states = np.asarray(r["states"])[None, :][:, ins.order]
            E = float(tnax.energy_Jij(J, ins.binary_states())[0])
            out[tag] = round(time.time() - t0, 2)
            out[tag + "_ok"] = abs(E - (-3336.773333)) < 1e-4
        print(json.dumps(dict(stage="flagship_L2048", **out)), flush=True)

    if "spectrum" in stages:
        J = load(2048, 1)
        out = {}
        for tag in ("cold", "warm"):
            ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J,
                              beta=3)
            np.random.seed(7)
            ins.add_noise(amplitude=1e-7)
            ins.precondition(mode="balancing")
            t0 = time.time()
            ins.search_low_energy_spectrum(
                excitations_encoding=2, M=1024, relative_P_cutoff=1e-8,
                Dmax=32, max_dEng=1.0, path="device", cand_factor=64,
                auto_grow=False)
            dt = time.time() - t0
            ins.decode_low_energy_states(max_dEng=1.0)
            out[tag] = round(dt, 2)
            out[tag + "_states"] = len(ins.energy)
            out[tag + "_overflow"] = int(ins.merge_overflow)
        print(json.dumps(dict(stage="spectrum_L2048_cf64", **out)),
              flush=True)

    if "j124" in stages:
        times = []
        for ids in ((1, 2), (3, 4)):
            t0 = time.time()
            solvers, Js = [], {}
            for k in ids:
                Js[k] = tnax.Jij_f2p(tnax.load_Jij(J124 % k))
                for rot in range(4):
                    ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8,
                                      J=Js[k], beta=0.75)
                    if rot:
                        ins.rotate_graph(rot=rot)
                    solvers.append(ins)
            rs = parallel.multi_flagship_search_gs(
                solvers, M=4096, relative_P_cutoff=1e-8, Dmax=48)
            res = []
            for gi, k in enumerate(ids):
                bE, bD = np.inf, 0
                for ins, r in zip(solvers[4 * gi:4 * gi + 4],
                                  rs[4 * gi:4 * gi + 4]):
                    ins.states = np.asarray(
                        r["states"])[None, :][:, ins.order]
                    E = float(tnax.energy_Jij(Js[k],
                                              ins.binary_states())[0])
                    if E < bE - 1e-9:
                        bE, bD = E, r["degeneracy"]
                    elif abs(E - bE) < 1e-9:
                        bD = max(bD, r["degeneracy"])
                res.append((k, bE, bD))
            times.append(dict(batch=ids, s=round(time.time() - t0, 2),
                              res=res))
        print(json.dumps(dict(stage="j124_C16_group2_lanepacked",
                              runs=times)), flush=True)

    if "fleet" in stages:
        ts = []
        for lo in (1, 9, 17):
            solvers = []
            for i in range(lo, lo + 8):
                solvers.append(tnax.Solver(mode="Ising", Nx=8, Ny=8, Nc=8,
                                           J=load(512, i), beta=3))
            t0 = time.time()
            rs = parallel.multi_flagship_search_gs(
                solvers, M=1024, relative_P_cutoff=1e-8, Dmax=32)
            ts.append(round(time.time() - t0, 2))
        print(json.dumps(dict(stage="fleet8_L512", batch_s=ts)),
              flush=True)


if __name__ == "__main__":
    main()
