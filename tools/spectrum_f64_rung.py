"""Terminal f64-host rung for spectrum-sweep instances the device ladder
could not anchor to the oracle ground state.

The GS conformance RUNBOOK's historical terminal rung — the host-exact
search in float64 on CPU — applied to the SPECTRUM contract: re-run the
instance through `search_low_energy_spectrum(path='host')` under
TNAX_PLATFORM=cpu / TNAX_X64=1 (f64 QR/SVD is CPU-only), decode, and
re-check the full acceptance contract (decode re-score + complete tree +
GS oracle). The corrected record is appended to the sweep JSONL with
`"rung": "f64host"`; sweep summaries take the last record per instance
(same convention as tools/r5_host_recheck.py).

This runs entirely on the host CPU, so it can execute concurrently with
TPU sweeps (the chip is untouched).

Usage: python tools/spectrum_f64_rung.py results/r5_spectrum_L2048.jsonl
       [--only 26 52] [--ee 2]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("TNAX_PLATFORM", "cpu")
os.environ.setdefault("TNAX_X64", "1")

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spectrum_conformance import (accept, check_spectrum, droplet_oracle,
                                  make_solver, solver_J_triples)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path")
    p.add_argument("--only", type=int, nargs="*", default=None)
    p.add_argument("--ee", type=int, default=2)
    p.add_argument("--D", type=int, default=32)
    p.add_argument("--M", type=int, default=1024)
    p.add_argument("--dE", type=float, default=1.0)
    p.add_argument("--max-states", type=int, default=1024)
    args = p.parse_args()

    last = {}
    for line in open(args.path):
        r = json.loads(line)
        if "instance" in r and "n_states" in r:
            last[r["instance"]] = r
    todo = [k for k, r in sorted(last.items())
            if not r.get("ok") and r.get("rung") != "f64host"]
    if args.only is not None:
        todo = [k for k in todo if k in args.only] or list(args.only)
    print(json.dumps({"f64_rung_todo": todo}), flush=True)
    L = int(args.path.rsplit("L", 1)[1].split(".")[0].split("_")[0])
    oracle = droplet_oracle(L)
    for k in todo:
        t0 = time.time()
        ins = make_solver(L, k, args.ee)
        J_orig = solver_J_triples(ins)
        ins.precondition(mode="balancing")
        ins.search_low_energy_spectrum(
            excitations_encoding=args.ee, M=args.M,
            relative_P_cutoff=1e-8, Dmax=args.D, max_dEng=args.dE,
            path="host")
        chk, _ = check_spectrum(ins, J_orig, oracle[k], args.dE,
                                args.max_states)
        rec = dict(instance=k, **chk, rot=0, rung="f64host",
                   search_s=round(time.time() - t0, 1))
        rec["ok"] = accept(rec)
        with open(args.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
