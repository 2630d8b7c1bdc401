"""Selection/cap sweep at the flagship operating points (on-chip).

The GS merge is exact whenever the per-site post-cutoff candidate count
fits the cap (merge_overflow counts the sites where it does not), so a
smaller ``cand_factor`` shrinks BOTH the selection top_k (k = cand+1)
and the merge lexsort width at zero exactness risk — overflow>0 flags
any instance that needs the fat-cap retry. This measures wall-clock vs
cap/select at:

1. L2048 single flagship (the bench headline; base 2.64 s warm at
   cand_factor=8, select=topk).
2. L512 fused fleet batch-8 (the production sweep mode).

One JSON line per combo: {cfg, warm_s, energy_ok, merge_overflow}.
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
REF_E = {512: -846.96, 2048: -3336.77333333}


def load(L, i):
    return tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(DROP % (L, i))),
                          1 / 75)


def flagship2048(cf, select):
    J = load(2048, 1)
    ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J, beta=3)
    ts = []
    for rep in range(3):
        ins._gauges = None
        t0 = time.time()
        r = parallel.flagship_search_gs(ins, M=1024,
                                        relative_P_cutoff=1e-8,
                                        Dmax=32, cand_factor=cf,
                                        select=select)
        ts.append(time.time() - t0)
    # exact host-side recompute of the found state's energy (the f32
    # device-accumulated r["energy"] drifts ~1e-5 at L2048 and must NOT
    # be the correctness criterion — bench.py's contract, 1e-4 tol)
    ins.states = np.asarray(r["states"])[None, :][:, ins.order]
    E = float(tnax.energy_Jij(J, ins.binary_states())[0])
    ok = abs(E - REF_E[2048]) < 1e-4
    print(json.dumps({"cfg": f"L2048 cf={cf} sel={select}",
                      "times": [round(t, 3) for t in ts],
                      "warm_s": round(min(ts[1:]), 3),
                      "energy_ok": bool(ok),
                      "merge_overflow": int(r["merge_overflow"])}),
          flush=True)


def fleet512(cf):
    outs = []
    ts = []
    for lo in (1, 9, 17):
        solvers = [tnax.Solver(mode="Ising", Nx=8, Ny=8, Nc=8,
                               J=load(512, i), beta=3)
                   for i in range(lo, lo + 8)]
        t0 = time.time()
        rs = parallel.multi_flagship_search_gs(
            solvers, M=1024, relative_P_cutoff=1e-8, Dmax=32,
            cand_factor=cf)
        ts.append(time.time() - t0)
        outs.extend(int(r["merge_overflow"]) for r in rs)
    print(json.dumps({"cfg": f"L512 fleet8 cf={cf}",
                      "batch_s": [round(t, 2) for t in ts],
                      "warm_batch_s": round(min(ts[1:]), 3),
                      "merge_overflow_max": max(outs)}), flush=True)


def sample512():
    """Warm Gibbs-sampling wall-clock at the reference e02 operating
    point (L512, D=48, M=128, beta=3, precondition on) — precondition +
    boundary + sampling scan + exact host energies, mirroring the
    reference's logged 'Total time'."""
    J = load(512, 1)
    ins = tnax.Solver(mode="Ising", Nx=8, Ny=8, Nc=8, J=J, beta=3)
    ts = []
    for seed in range(3):
        t0 = time.time()
        ins._gauges = None
        ins.precondition(mode="balancing")
        ctx = ins._context()
        r = parallel.device_sample(ctx, M=128, Dmax=48, seed=seed)
        ts.append(time.time() - t0)
    ins.states = np.asarray(r["states"])[:, ins.order]
    Es = tnax.energy_Jij(J, ins.binary_states())
    consistent = bool(np.max(np.abs(np.asarray(r["energy"]) - Es)) < 1e-6)
    print(json.dumps({"cfg": "L512 sample D=48 M=128",
                      "times": [round(t, 3) for t in ts],
                      "warm_s": round(min(ts[1:]), 3),
                      "energy_consistent": consistent}), flush=True)


def main():
    import jax
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    for cf, sel in ((8, "topk"), (4, "topk"), (2, "topk"), (1, "topk"),
                    (2, "sort")):
        flagship2048(cf, sel)
    for cf in (8, 2):
        fleet512(cf)
    sample512()


if __name__ == "__main__":
    main()
