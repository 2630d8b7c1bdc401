"""Reference-vs-tnax decoded-spectrum parity on the ee=2 decode_err
outliers.

The L512 ee=2 dE=1 spectrum sweep has instances whose decoded state
energies, re-scored with the independent `energy_Jij` verifier, miss by
0.27-4.5 (results/r4_spectrum_L512.jsonl).  The claim under test: the v2
excitation encoding's decoded energies are inherently inexact at this
scale — the REFERENCE produces the identical outliers on the identical
noisy instance.  Protocol (matches results/r4_decode_parity.jsonl):

  - same noisy instance: np.random.seed(1000+k) immediately before
    add_noise(amplitude=1e-7) (both packages draw from the global legacy
    RNG, reference tnac4o.py:928-941);
  - same operating point as the sweep: D=32, M=1024, cutoff 1e-8,
    max_dEng=1, precondition balancing, rot=0, host-exact path for tnax;
  - decode 1024 states; record decode_err_max / n_bad vs energy_Jij on
    the NOISY couplings (reference contract test_examples.py:100-104);
  - parity: the FULL sorted 1024-state decoded energy lists must agree
    elementwise (<1e-9; measured <3e-12 on every instance checked so far).

Usage:
  python tools/decode_parity.py --L 512 --only 33 34 52 61 84 6
  python tools/decode_parity.py --L 512 --only 18 --which ref
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(1, "/root/reference")

import numpy as np

INST = os.environ.get("TNAX_INSTANCES", "/root/reference/instances")
SHAPES = {128: (4, 4, 8), 512: (8, 8, 8), 1152: (12, 12, 8),
          2048: (16, 16, 8)}


def run_one(pkg, L, k, ee, D, M, dE, max_states, rot=0):
    """One decoded spectrum through `pkg` (tnax or the reference tnac4o —
    both expose the same API surface by design). Returns (record, sorted
    energy list).  `rot` rotates the graph AFTER the seeded noise (the
    e06 protocol order, reference tnac4o.py:290,928); the noisy couplings
    for the independent re-score are captured from the ROTATED frame so
    states and couplings stay consistent, and the sorted energy lists
    compared across packages are frame-invariant."""
    Nx, Ny, Nc = SHAPES[L]
    f = os.path.join(INST, "Chimera_droplet_instances",
                     f"chimera{L}_spinglass_power", "%03d.txt" % k)
    J = pkg.round_Jij(pkg.Jij_f2p(pkg.load_Jij(f)), 1 / 75)
    cls = pkg.Solver if hasattr(pkg, "Solver") else pkg.tnac4o
    ins = cls(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=3)
    if ee > 1:
        np.random.seed(1000 + k)
        ins.add_noise(amplitude=1e-7)
    if rot:
        ins.rotate_graph(rot)
    coo = ins.J.tocoo()
    J_noisy = list(zip(coo.row.tolist(), coo.col.tolist(),
                       coo.data.tolist()))
    t0 = time.time()
    ins.precondition(mode="balancing")
    ins.search_low_energy_spectrum(excitations_encoding=ee, M=M,
                                   relative_P_cutoff=1e-8, Dmax=D,
                                   max_dEng=dE)
    ins.decode_low_energy_states(max_dEng=dE, max_states=max_states)
    E = np.asarray(ins.energy, dtype=np.float64)
    E_ind = pkg.energy_Jij(J_noisy, ins.binary_states())
    errs = np.abs(E - E_ind)
    bad = np.flatnonzero(errs > 1e-4)
    rec = dict(n=int(len(E)), decode_err_max=float(errs.max()),
               n_bad=int(len(bad)),
               first_bad=int(bad[0]) if len(bad) else None,
               E0=float(E.min()), s=round(time.time() - t0, 1))
    return rec, np.sort(E)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=512, choices=sorted(SHAPES))
    p.add_argument("--only", type=int, nargs="+", required=True)
    p.add_argument("--which", choices=["ref", "tnax", "both"],
                   default="both")
    p.add_argument("--ee", type=int, default=2)
    p.add_argument("--D", type=int, default=32)
    p.add_argument("--M", type=int, default=1024)
    p.add_argument("--dE", type=float, default=1.0)
    p.add_argument("--max-states", type=int, default=1024)
    p.add_argument("--rot", type=int, default=0,
                   help="rotate the graph (e06 protocol) before the "
                        "search; energy lists stay frame-invariant")
    args = p.parse_args()

    pkgs = {}
    if args.which in ("tnax", "both"):
        import tnax
        pkgs["tnax"] = tnax
    if args.which in ("ref", "both"):
        import tnac4o
        pkgs["ref"] = tnac4o

    all_ok = True
    for k in args.only:
        lists = {}
        for name, pkg in pkgs.items():
            rec, E = run_one(pkg, args.L, k, args.ee, args.D, args.M,
                             args.dE, args.max_states, rot=args.rot)
            lists[name] = E
            print(json.dumps(dict(which=name, L=args.L, instance=k,
                                  rot=args.rot, **rec)),
                  flush=True)
        if len(lists) == 2:
            m = min(len(lists["ref"]), len(lists["tnax"]))
            diff = float(np.max(np.abs(lists["ref"][:m]
                                       - lists["tnax"][:m])))
            ok = bool(len(lists["ref"]) == len(lists["tnax"])
                      and diff < 1e-9)
            all_ok &= ok
            print(json.dumps(dict(L=args.L, instance=k,
                                  full_list_max_diff=diff,
                                  n_ref=len(lists["ref"]),
                                  n_tnax=len(lists["tnax"]),
                                  parity_ok=ok)), flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
