"""Round-3 probe 3: fleet select A/B + batch-16 scaling; L2048 spectrum
device/replay split (amortized-GC replay); 8x L512 fleet spectrum."""

import json
import os
import sys
import time

os.environ["TNAX_SPECTRUM_TIMING"] = "1"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import tnax
from tnax import parallel, spectrum
from tnax import precondition as pre

import logging
logging.basicConfig(level="INFO")

SHAPES = {128: (4, 4, 8), 512: (8, 8, 8), 1152: (12, 12, 8),
          2048: (16, 16, 8)}
DROP = ("/root/reference/instances/Chimera_droplet_instances/"
        "chimera%d_spinglass_power/%03d.txt")


def load(L, i):
    return tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(DROP % (L, i))), 1 / 75)


def fleet(batch_ids, select, L=512):
    Nx, Ny, Nc = SHAPES[L]
    t0 = time.time()
    solvers, Js = [], []
    for i in batch_ids:
        Js.append(load(L, i))
        solvers.append(tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc,
                                   J=Js[-1], beta=3))
    betas = [3 * 2.0 ** (nn - 2) for nn in range(2)]
    for ins, X in zip(solvers, pre.precondition_fleet(
            [s.problem for s in solvers], betas)):
        ins._gauges = X
    t1 = time.time()
    ctxs = [ins._context() for ins in solvers]
    rs = parallel.multi_search_gs(ctxs, M=1024, relative_P_cutoff=1e-8,
                                  Dmax=32, select=select)
    t2 = time.time()
    n_ok = 0
    for J, ins, r in zip(Js, solvers, rs):
        ins.states = np.asarray(r["states"])[None, :][:, ins.order]
        E = float(tnax.energy_Jij(J, ins.binary_states())[0])
        n_ok += abs(E - r["energy"]) < 1e-3
    return dict(select=select, B=len(batch_ids), pre_s=round(t1 - t0, 2),
                search_s=round(t2 - t1, 2), total_s=round(t2 - t0, 2),
                inst_per_min=round(60 * len(batch_ids) / (t2 - t0), 1))


for select in ("compact", "topk"):
    cold = fleet(list(range(1, 9)), select)
    warm = fleet(list(range(9, 17)), select)
    warm2 = fleet(list(range(17, 25)), select)
    print(json.dumps(dict(mode="fleet8", cold=cold, warm=warm,
                          warm2=warm2)), flush=True)

c16 = fleet(list(range(1, 17)), "compact")
w16 = fleet(list(range(17, 33)), "compact")
print(json.dumps(dict(mode="fleet16", cold=c16, warm=w16)), flush=True)


def spectrum_l2048():
    ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=load(2048, 1),
                      beta=3)
    np.random.seed(7)
    ins.add_noise(amplitude=1e-7)
    ins.precondition(mode="balancing")
    t0 = time.time()
    ins.search_low_energy_spectrum(excitations_encoding=2, M=1024,
                                   relative_P_cutoff=1e-8, Dmax=32,
                                   max_dEng=1.0, path="device",
                                   auto_grow=True)
    return round(time.time() - t0, 2)


s1 = spectrum_l2048()
s2 = spectrum_l2048()
print(json.dumps(dict(mode="spectrum_L2048_ee2", cold_s=s1, warm_s=s2)),
      flush=True)


def fleet_spectrum(batch_ids):
    t0 = time.time()
    inss = []
    for i in batch_ids:
        ins = tnax.Solver(mode="Ising", Nx=8, Ny=8, Nc=8, J=load(512, i),
                          beta=3)
        np.random.seed(7)
        ins.add_noise(amplitude=1e-7)
        inss.append(ins)
    ctxs = [ins._context() for ins in inss]
    rs = spectrum.multi_search_spectrum(inss, ctxs, 2, M=1024,
                                        relative_P_cutoff=1e-8, Dmax=32,
                                        max_dEng=1.0)
    nst = []
    for ins, r in zip(inss, rs):
        ins.energy, ins.probability = r.energy, r.probability
        ins.degeneracy = r.degeneracy
        ins.states = r.states[:, ins.order]
        ins.merge_overflow = r.merge_overflow
        ins.decode_low_energy_states(max_dEng=1.0)
        nst.append(len(ins.energy))
    return dict(B=len(batch_ids), total_s=round(time.time() - t0, 2),
                n_states=nst)


f1 = fleet_spectrum(list(range(1, 9)))
f2 = fleet_spectrum(list(range(9, 17)))
print(json.dumps(dict(mode="fleet_spectrum8_L512", cold=f1, warm=f2)),
      flush=True)
