"""A/B: select='sort' vs 'topk' at production shapes (the scan's
selection is ~70% of per-site cost; sort_key_val is bit-identical).

1. L512 fused fleet batch-8 (compile + 2 warm batches per select).
2. C16 fused batch-8 at D=48/M=4096 (k=32769 — where top_k should hurt).
3. L2048 single flagship (the bench headline).
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
J124 = "/root/reference/instances/Chimera_J124/C=16_J124/%03d.txt"


def load(L, i):
    return tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(DROP % (L, i))),
                          1 / 75)


def fleet512(select):
    ts = []
    for lo in (1, 9, 17):
        solvers = [tnax.Solver(mode="Ising", Nx=8, Ny=8, Nc=8,
                               J=load(512, i), beta=3)
                   for i in range(lo, lo + 8)]
        t0 = time.time()
        parallel.multi_flagship_search_gs(solvers, M=1024,
                                          relative_P_cutoff=1e-8,
                                          Dmax=32, select=select)
        ts.append(round(time.time() - t0, 2))
    return ts


def c16(select):
    ts = []
    for lo in (1, 9):
        solvers = []
        for k in range(lo, lo + 8):
            J = tnax.Jij_f2p(tnax.load_Jij(J124 % k))
            solvers.append(tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8,
                                       J=J, beta=0.75))
        t0 = time.time()
        parallel.multi_flagship_search_gs(solvers, M=4096,
                                          relative_P_cutoff=1e-8,
                                          Dmax=48, select=select)
        ts.append(round(time.time() - t0, 2))
    return ts


def flagship2048(select):
    J = load(2048, 1)
    ts = []
    for rep in range(3):
        ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J, beta=3)
        t0 = time.time()
        r = parallel.flagship_search_gs(ins, M=1024,
                                        relative_P_cutoff=1e-8, Dmax=32,
                                        select=select)
        ins.states = np.asarray(r["states"])[None, :][:, ins.order]
        E = float(tnax.energy_Jij(J, ins.binary_states())[0])
        assert abs(E - (-3336.773333)) < 1e-4, E
        ts.append(round(time.time() - t0, 2))
    return ts


if __name__ == "__main__":
    stages = os.environ.get("R3P4_STAGES", "fleet,c16,flagship").split(",")
    if "fleet" in stages:
        for sel in ("sort", "topk"):
            print(json.dumps(dict(stage="fleet512", select=sel,
                                  batch_s=fleet512(sel))), flush=True)
    if "c16" in stages:
        for sel in ("sort", "topk"):
            print(json.dumps(dict(stage="c16", select=sel,
                                  batch_s=c16(sel))), flush=True)
    if "flagship" in stages:
        for sel in ("sort", "topk"):
            print(json.dumps(dict(stage="flagship2048", select=sel,
                                  runs_s=flagship2048(sel))), flush=True)
