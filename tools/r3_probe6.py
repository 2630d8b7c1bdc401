"""Fidelity probe: L2048 droplet instance 92 (oracle -3411.813333).

Round 2's separate-phase device path solved it at rot=2 in 14.6 s
(results/droplet_L2048.jsonl); the round-3 fused flagship misses at all
4 rotations and at the D=48/M=2048 escalation (droplet_L2048_esc_r3).
This runs both paths at rot=2 (and the fused at all rotations with
select='sort') to localize whether a round-3 change (fused ladder /
lane packing / rsvd zip-up) moved the f32 rounding off the lucky path.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tnax
from tnax import parallel
from tnax.search import ContractionContext

ORACLE = -3411.813333


def load():
    J = tnax.load_Jij(
        "/root/reference/instances/Chimera_droplet_instances/"
        "chimera2048_spinglass_power/092.txt")
    return tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)


def solver(rot):
    ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=load(), beta=3)
    if rot:
        ins.rotate_graph(rot=rot)
    return ins


def run(tag, rot, mode, select="topk"):
    ins = solver(rot)
    t0 = time.time()
    if mode == "fused":
        r = parallel.flagship_search_gs(ins, M=1024,
                                        relative_P_cutoff=1e-8, Dmax=32,
                                        select=select)
        states = np.asarray(r["states"])[None, :]
    else:
        ins.precondition(mode="balancing")
        ctx = ins._context()
        r = parallel.device_search_gs(ctx, M=1024,
                                      relative_P_cutoff=1e-8, Dmax=32)
        states = np.asarray(r["states"])[None, :]
    ins.states = states[:, ins.order]
    E = float(tnax.energy_Jij(load(), ins.binary_states())[0])
    print(json.dumps({"cfg": tag, "rot": rot, "E": E,
                      "hit": bool(abs(E - ORACLE) < 1e-4),
                      "s": round(time.time() - t0, 2)}), flush=True)
    return abs(E - ORACLE) < 1e-4


def main():
    import jax
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    run("two-phase r2 path", 2, "twophase")
    for rot in range(4):
        if run("fused select=sort", rot, "fused", select="sort"):
            break


if __name__ == "__main__":
    main()
