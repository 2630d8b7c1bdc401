"""Round-3 probe 2: (a) rowsort-compact vs topk selection at L2048,
(b) end-to-end 8x L512 fleet phases (context build, fleet precondition,
batched search cold/warm). One long-lived TPU process."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import tnax
from tnax import parallel

SHAPES = {128: (4, 4, 8), 512: (8, 8, 8), 1152: (12, 12, 8),
          2048: (16, 16, 8)}
DROP = ("/root/reference/instances/Chimera_droplet_instances/"
        "chimera%d_spinglass_power/%03d.txt")


def load(L, i):
    return tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(DROP % (L, i))), 1 / 75)


def single(L, select, J):
    Nx, Ny, Nc = SHAPES[L]
    t0 = time.time()
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=3)
    ins.precondition(mode="balancing")
    t1 = time.time()
    ctx = ins._context()
    ctx.build_boundary(32, 1e-16, 1e-10, 20, True)
    np.asarray(ctx.rhoT[0, 0, 0, 0])
    t2 = time.time()
    res = parallel.device_search_gs(ctx, M=1024, relative_P_cutoff=1e-8,
                                    Dmax=32, select=select)
    t3 = time.time()
    ins.states = res["states"][None, :][:, ins.order]
    E = float(tnax.energy_Jij(J, ins.binary_states())[0])
    return dict(select=select, pre_s=round(t1 - t0, 3),
                boundary_s=round(t2 - t1, 3), search_s=round(t3 - t2, 3),
                total_s=round(t3 - t0, 3), energy=E, deg=res["degeneracy"],
                ovf=res["merge_overflow"])


def fused(L, select, J):
    """The bench-style run: no sync points between phases."""
    Nx, Ny, Nc = SHAPES[L]
    t0 = time.time()
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=3)
    ins.precondition(mode="balancing")
    ctx = ins._context()
    res = parallel.device_search_gs(ctx, M=1024, relative_P_cutoff=1e-8,
                                    Dmax=32, select=select)
    dt = time.time() - t0
    ins.states = res["states"][None, :][:, ins.order]
    E = float(tnax.energy_Jij(J, ins.binary_states())[0])
    return dict(select=select, total_s=round(dt, 3), energy=E)


def fleet(batch_ids, pre_fleet=True):
    from tnax import precondition as pre
    Nx, Ny, Nc = SHAPES[512]
    t0 = time.time()
    solvers = []
    for i in batch_ids:
        J = load(512, i)
        solvers.append(tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J,
                                   beta=3))
    t1 = time.time()
    if pre_fleet:
        betas = [3 * 2.0 ** (nn - 2) for nn in range(2)]
        for ins, X in zip(solvers, pre.precondition_fleet(
                [s.problem for s in solvers], betas)):
            ins._gauges = X
    else:
        for ins in solvers:
            ins.precondition(mode="balancing")
    t2 = time.time()
    ctxs = [ins._context() for ins in solvers]
    t3 = time.time()
    rs = parallel.multi_search_gs(ctxs, M=1024, relative_P_cutoff=1e-8,
                                  Dmax=32)
    t4 = time.time()
    ok = 0
    for i, ins, r in zip(batch_ids, solvers, rs):
        ins.states = np.asarray(r["states"])[None, :][:, ins.order]
        E = float(tnax.energy_Jij(ins.problem.J if 0 else load(512, i),
                                  ins.binary_states())[0])
    return dict(load_s=round(t1 - t0, 3), pre_s=round(t2 - t1, 3),
                ctx_s=round(t3 - t2, 3), search_s=round(t4 - t3, 3),
                total_s=round(t4 - t0, 3))


J2048 = load(2048, 1)
for select in ("compact", "topk"):
    cold = single(2048, select, J2048)
    warm = single(2048, select, J2048)
    print(json.dumps(dict(mode="single", cold=cold, warm=warm)), flush=True)
fz = fused(2048, "compact", J2048)
fz2 = fused(2048, "compact", J2048)
print(json.dumps(dict(mode="fused", runs=[fz, fz2])), flush=True)

c1 = fleet(list(range(1, 9)))
c2 = fleet(list(range(9, 17)))
c3 = fleet(list(range(17, 25)))
print(json.dumps(dict(mode="fleet8_L512", cold=c1, warm=c2, warm2=c3)),
      flush=True)
