"""Round-3 probe: A/B the search-scan candidate selection (compact cumsum
vs prob-ordered top-k) on the flagship L2048 GS workload, with per-phase
timing. One long-lived process (tunnel compiles amortize in-process only).

Usage: python tools/r3_probe.py [L]
"""

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

L = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
D, M = 32, 1024
Nx, Ny, Nc = SHAPES[L]
J = tnax.load_Jij(
    "/root/reference/instances/Chimera_droplet_instances/"
    f"chimera{L}_spinglass_power/001.txt")
J = tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)


def phase_run(select):
    t0 = time.time()
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=3)
    ins.precondition(mode="balancing")
    t1 = time.time()
    ctx = ins._context()
    ctx.build_boundary(D, 1e-16, 1e-10, 20, True)
    np.asarray(ctx.rhoT[0, 0, 0, 0])     # host pull = sync point
    t2 = time.time()
    res = parallel.device_search_gs(ctx, M=M, relative_P_cutoff=1e-8,
                                    Dmax=D, select=select)
    t3 = time.time()
    ins.states = res["states"][None, :][:, ins.order]
    E = float(tnax.energy_Jij(J, ins.binary_states())[0])
    return dict(select=select, pre_s=round(t1 - t0, 3),
                boundary_s=round(t2 - t1, 3), search_s=round(t3 - t2, 3),
                total_s=round(t3 - t0, 3), energy=E,
                deg=res["degeneracy"], ovf=res["merge_overflow"],
                pd=res["discarded_probability"])


for select in ("compact", "topk"):
    cold = phase_run(select)
    warm = phase_run(select)
    warm2 = phase_run(select)
    print(json.dumps(dict(cold=cold, warm=warm, warm2=warm2)), flush=True)
