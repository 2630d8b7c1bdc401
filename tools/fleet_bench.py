"""Fleet throughput benchmark: batched instances on one chip.

Measures instances/minute for the production pattern (many droplet
instances and/or 4 rotations of each, vmap-batched through
`tnax.parallel.multi_search_gs`). Compare with the per-instance reference
CPU wall-clock in BASELINE.md.

Usage: python tools/fleet_bench.py [--L 512] [--batch 8] [--D 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tnax
from tnax import parallel
from tnax.search import ContractionContext

INST = os.environ.get("TNAX_INSTANCES", "/root/reference/instances")
SHAPES = {128: (4, 4, 8), 512: (8, 8, 8), 1152: (12, 12, 8),
          2048: (16, 16, 8)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--D", type=int, default=32)
    p.add_argument("--M", type=int, default=1024)
    p.add_argument("--no-pre", dest="pre", action="store_false")
    p.set_defaults(pre=True)
    args = p.parse_args()

    Nx, Ny, Nc = SHAPES[args.L]
    sys.path.insert(0, os.path.dirname(__file__))
    from conformance import droplet_oracle
    oracle = droplet_oracle(args.L)

    ctxs, Js, solvers = [], [], []
    for k in range(1, args.batch + 1):
        f = os.path.join(INST, "Chimera_droplet_instances",
                         f"chimera{args.L}_spinglass_power", "%03d.txt" % k)
        J = tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(f)), 1 / 75)
        ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=3)
        if args.pre:
            ins.precondition(mode="balancing")
        ctxs.append(ins._context())
        Js.append(J)
        solvers.append(ins)

    def run():
        t0 = time.time()
        res = parallel.multi_search_gs(ctxs, M=args.M,
                                       relative_P_cutoff=1e-8, Dmax=args.D)
        return time.time() - t0, res

    cold, res = run()
    warm, res = run()
    n_ok = 0
    for k, (r, ins, J) in enumerate(zip(res, solvers, Js), start=1):
        ins.states = r["states"][None, :][:, ins.order]
        E = float(tnax.energy_Jij(J, ins.binary_states())[0])
        ok = abs(E - oracle[k]) < 1e-4
        n_ok += ok
        print(f"# instance {k}: E={E:.6f} oracle={oracle[k]} ok={ok}",
              file=sys.stderr)
    print(json.dumps({
        "metric": f"fleet GS search, chimera L={args.L} D={args.D}, "
                  f"batch={args.batch} (warm)",
        "value": round(warm, 3), "unit": "s",
        "instances_per_min": round(60 * args.batch / warm, 2),
        "matched": n_ok, "batch": args.batch, "cold_s": round(cold, 3),
    }))


if __name__ == "__main__":
    main()
