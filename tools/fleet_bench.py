"""Fleet throughput benchmark: batched instances on one chip.

Measures instances/minute for the production pattern (many droplet
instances vmap-batched through the FUSED fleet flagship
`tnax.parallel.multi_flagship_search_gs` — preconditioning ladder +
boundary build + search in one program/dispatch). Protocol: one compile
batch on instances [1..B], then a warm batch on FRESH instances
[B+1..2B] — the reported rate includes instance load + exact host
energy verification, the full production pipeline. Compare with the
per-instance reference CPU wall-clock in BASELINE.md.

`--legacy` keeps the old two-program path (per-instance host
preconditioner + `multi_search_gs`) for comparison.

Usage: python tools/fleet_bench.py [--L 512] [--batch 8] [--D 32]
       [--cand-factor 8] [--legacy]
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

INST = os.environ.get("TNAX_INSTANCES", "/root/reference/instances")
SHAPES = {128: (4, 4, 8), 512: (8, 8, 8), 1152: (12, 12, 8),
          2048: (16, 16, 8)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=512)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--D", type=int, default=32)
    p.add_argument("--M", type=int, default=1024)
    p.add_argument("--cand-factor", type=int, default=8)
    p.add_argument("--legacy", action="store_true")
    p.add_argument("--start", type=int, default=1)
    p.add_argument("--no-rsvd", action="store_true",
                   help="zipup_rsvd=False (the deterministic zip-up that "
                        "fixed the L2048 escalation stragglers) — measures "
                        "its fleet cost vs the rsvd sketch default")
    args = p.parse_args()

    Nx, Ny, Nc = SHAPES[args.L]
    sys.path.insert(0, os.path.dirname(__file__))
    from conformance import droplet_oracle
    oracle = droplet_oracle(args.L)
    B = args.batch

    def load(k):
        f = os.path.join(INST, "Chimera_droplet_instances",
                         f"chimera{args.L}_spinglass_power", "%03d.txt" % k)
        return tnax.round_Jij(tnax.Jij_f2p(tnax.load_Jij(f)), 1 / 75)

    def batch(ids):
        """Full production pipeline on one batch: load, fused fleet
        search, exact host energy + oracle check."""
        t0 = time.time()
        Js = [load(k) for k in ids]
        solvers = [tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J,
                               beta=3) for J in Js]
        if args.legacy:
            for ins in solvers:
                ins.precondition(mode="balancing")
            ctxs = [ins._context() for ins in solvers]
            res = parallel.multi_search_gs(ctxs, M=args.M,
                                           relative_P_cutoff=1e-8,
                                           Dmax=args.D)
        else:
            res = parallel.multi_flagship_search_gs(
                solvers, M=args.M, relative_P_cutoff=1e-8, Dmax=args.D,
                cand_factor=args.cand_factor,
                zipup_rsvd=False if args.no_rsvd else None)
        n_ok = 0
        for k, r, ins, J in zip(ids, res, solvers, Js):
            ins.states = np.asarray(r["states"])[None, :][:, ins.order]
            E = float(tnax.energy_Jij(J, ins.binary_states())[0])
            n_ok += abs(E - oracle[k]) < 1e-4
        return time.time() - t0, n_ok

    cold, ok0 = batch(list(range(args.start, args.start + B)))
    warm, ok1 = batch(list(range(args.start + B, args.start + 2 * B)))
    print(json.dumps({
        "metric": f"fleet GS search, chimera L={args.L} D={args.D}, "
                  f"batch={B} ({'legacy' if args.legacy else 'fused'}"
                  f"{', rsvd off' if args.no_rsvd else ''}, "
                  f"warm fresh-instance batch)",
        "value": round(warm, 3), "unit": "s",
        "instances_per_min": round(60 * B / warm, 2),
        "matched_first_pass": f"{ok0 + ok1}/{2 * B}",
        "batch": B, "cold_s": round(cold, 3),
    }))


if __name__ == "__main__":
    main()
