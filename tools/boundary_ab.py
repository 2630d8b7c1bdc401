"""Boundary-build quality/speed A/B: zip-up truncation variants under the
full fused GS fleet at ensemble scale (VERDICT r4 tasks 5+6).

Variants of the per-site zip-up truncation (`tnax.bmps.zipup_apply`):
  default — randomized f32 sketch (the production default),
  bf16    — the sketch with a bfloat16 range-finder / f32 projection
            (`_rsvd(bf16=True)`; candidate speed lever, must be
            oracle-gated before adoption),
  wide    — the sketch with 2*Dmax+32 oversampling (fidelity mid-point:
            ~1.5x the range-finder GEMM cost, candidate cure for the
            ~75% L2048 first-pass rate),
  off     — exact SVD (the escalation rung; 7/8 vs 4/8 first-pass at
            1.7x batch cost in results/r4_fleet_upshape.jsonl — this
            sweep decides whether it wins on TOTAL-sweep seconds as the
            L2048 default).

Each variant runs the fused fleet flagship over the SAME instance set and
reports per-batch wall clock + first-pass oracle matches, then a summary
with the projected full-sweep cost model (first-pass waves + measured
per-miss escalation cost).

Usage: python tools/boundary_ab.py --L 2048 --n 20 --batch 4
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
VARIANTS = {"default": None, "bf16": "bf16", "wide": "wide", "off": False}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=2048)
    p.add_argument("--n", type=int, default=20)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--D", type=int, default=32)
    p.add_argument("--M", type=int, default=1024)
    p.add_argument("--cand-factor", type=int, default=8)
    p.add_argument("--start", type=int, default=1)
    p.add_argument("--variants", nargs="*", default=list(VARIANTS))
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

    ids_all = list(range(args.start, args.start + args.n))
    for name in args.variants:
        rsvd = VARIANTS[name]
        times, misses = [], []
        for lo in range(0, len(ids_all), B):
            ids = ids_all[lo:lo + B]
            ids = ids + [ids[-1]] * (B - len(ids))
            t0 = time.time()
            Js = [load(k) for k in ids]
            solvers = [tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc,
                                   J=J, beta=3) for J in Js]
            res = parallel.multi_flagship_search_gs(
                solvers, M=args.M, relative_P_cutoff=1e-8, Dmax=args.D,
                cand_factor=args.cand_factor, zipup_rsvd=rsvd)
            dt = time.time() - t0
            n_ok = 0
            for k, r, ins, J in zip(ids, res, solvers, Js):
                ins.states = np.asarray(r["states"])[None, :][:, ins.order]
                E = float(tnax.energy_Jij(J, ins.binary_states())[0])
                hit = abs(E - oracle[k]) < 1e-4
                n_ok += hit
                if not hit:
                    misses.append(k)
            times.append(dt)
            print(json.dumps({"variant": name, "batch0": ids[0],
                              "batch_s": round(dt, 2), "ok": n_ok}),
                  flush=True)
        warm = sorted(times)[len(times) // 2] if len(times) > 1 else times[0]
        print(json.dumps({
            "variant": name, "n": args.n,
            "first_pass": args.n - len(set(misses)),
            "misses": sorted(set(misses)),
            "cold_batch_s": round(times[0], 2),
            "median_warm_batch_s": round(warm, 2),
            "inst_per_min_warm": round(60 * B / warm, 2)}), flush=True)


if __name__ == "__main__":
    main()
