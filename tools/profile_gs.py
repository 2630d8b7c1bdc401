"""Phase-level timing of the flagship L2048 GS search (warm).

Splits the 3.55 s warm wall-clock into: precondition (device beta-ladder
balancing), boundary build (zip-up + rsvd), the fused search scan, and
the result pull, to direct further optimization.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import tnax
from tnax import parallel, engine

J = tnax.load_Jij(
    "/root/reference/instances/Chimera_droplet_instances/"
    "chimera2048_spinglass_power/001.txt")
J = tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)


def once(it):
    t = {}
    t0 = time.time()
    ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J, beta=3)
    t["setup"] = time.time() - t0

    t0 = time.time()
    ins.precondition(mode="balancing")
    t["precondition"] = time.time() - t0

    t0 = time.time()
    ctx = ins._context()
    t["context"] = time.time() - t0

    t0 = time.time()
    ctx.build_boundary(32, 1e-16, 1e-10, 20, True)
    jax.block_until_ready(ctx.rhoT)
    t["boundary"] = time.time() - t0

    t0 = time.time()
    r = parallel.device_search_gs(ctx, M=1024, relative_P_cutoff=1e-8,
                                  Dmax=32)
    t["scan+pull"] = time.time() - t0

    t0 = time.time()
    ins.states = r["states"][None, :][:, ins.order]
    E = float(tnax.energy_Jij(J, ins.binary_states())[0])
    t["recheck"] = time.time() - t0
    t["total"] = sum(t.values())
    t = {k: round(v, 3) for k, v in t.items()}
    print(json.dumps(dict(it=it, E=E, **t)), flush=True)


for it in range(3):
    once(it)
