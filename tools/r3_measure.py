"""Round-3 measurement session (ONE TPU process, shape-grouped jobs):

1. L2048 fused flagship GS (cold + 2 warm) — the bench headline through
   `parallel.flagship_search_gs`.
2. L2048 ee=2 COMPLETE-TREE spectrum (cand_factor=128, merge_overflow=0
   expected) x2 with the device/replay phase split (VERDICT r2 task 4:
   target <= 12 s warm).
3. J124 C16 grouped 4-rotation batches at group=2 and group=4 (the
   conformance production shape) — batch seconds after compile.

Writes one JSON line per stage to stdout.
"""

import json
import logging
import os
import sys
import time

os.environ["TNAX_SPECTRUM_TIMING"] = "1"

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


def stage_flagship():
    J = load(2048, 1)
    out = {}
    for tag in ("cold", "warm1", "warm2"):
        ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J, beta=3)
        t0 = time.time()
        r = parallel.flagship_search_gs(ins, M=1024,
                                        relative_P_cutoff=1e-8, Dmax=32)
        ins.states = np.asarray(r["states"])[None, :][:, ins.order]
        E = float(tnax.energy_Jij(J, ins.binary_states())[0])
        out[tag] = round(time.time() - t0, 2)
        out[tag + "_E"] = E
    print(json.dumps(dict(stage="flagship_L2048", **out)), flush=True)


def stage_spectrum():
    J = load(2048, 1)
    out = {}
    for tag in ("cold", "warm"):
        ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J, beta=3)
        np.random.seed(7)
        ins.add_noise(amplitude=1e-7)
        ins.precondition(mode="balancing")
        t0 = time.time()
        ins.search_low_energy_spectrum(excitations_encoding=2, M=1024,
                                       relative_P_cutoff=1e-8, Dmax=32,
                                       max_dEng=1.0, path="device",
                                       cand_factor=128, auto_grow=False)
        dt = time.time() - t0
        ins.decode_low_energy_states(max_dEng=1.0)
        out[tag] = round(dt, 2)
        out[tag + "_states"] = len(ins.energy)
        out[tag + "_overflow"] = int(ins.merge_overflow)
    print(json.dumps(dict(stage="spectrum_L2048_complete", **out)),
          flush=True)


def stage_j124(group):
    oracle = {}
    with open("/root/reference/instances/Chimera_J124/C=16_J124/"
              "results_C16_J124.txt") as f:
        for line in f:
            p = line.split()
            if len(p) >= 3 and p[0].isdigit():
                oracle[int(p[0])] = (float(p[1]), int(p[2]))
    times, oks = [], 0
    todo = list(range(1, 2 * group + 1))
    for lo in range(0, len(todo), group):
        ids = todo[lo:lo + group]
        t0 = time.time()
        Js, solvers = {}, []
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
        for gi, k in enumerate(ids):
            bE, bD = np.inf, 0
            for ins, r in zip(solvers[4 * gi:4 * gi + 4],
                              rs[4 * gi:4 * gi + 4]):
                ins.states = np.asarray(r["states"])[None, :][:, ins.order]
                E = float(tnax.energy_Jij(Js[k], ins.binary_states())[0])
                if E < bE - 1e-9:
                    bE, bD = E, r["degeneracy"]
                elif abs(E - bE) < 1e-9:
                    bD = max(bD, r["degeneracy"])
            oE, oD = oracle[k]
            oks += abs(bE - oE) < 1e-9 and bD == oD
        times.append(round(time.time() - t0, 2))
        solvers = []
    print(json.dumps(dict(stage="j124_C16_group%d" % group,
                          batch_s=times, ok=oks, n=len(todo))), flush=True)


def stage_fleet16():
    """Droplet L512 conformance in fused fleet batches of 16 (compile +
    warm scaling vs the batch-8 default)."""
    import conformance
    t0 = time.time()
    res = conformance.run_droplet_batched(512, 64, 32, 1024, True,
                                          batch=16)
    n_ok = sum(r["ok"] for r in res)
    print(json.dumps(dict(stage="fleet16_L512", ok=n_ok, n=len(res),
                          total_s=round(time.time() - t0, 2))), flush=True)


if __name__ == "__main__":
    stages = os.environ.get("R3M_STAGES",
                            "flagship,spectrum,j124_2").split(",")
    if "flagship" in stages:
        stage_flagship()
    if "spectrum" in stages:
        stage_spectrum()
    if "fleet16" in stages:
        stage_fleet16()
    if "j124_2" in stages:
        stage_j124(2)
    if "j124_4" in stages:
        stage_j124(4)
