"""Probe: does the device-record SPECTRUM beam land on the same minimum
as the device GS beam under identical physics?

L2048 instance 26 walked all 9 spectrum escalation waves 5.5+ above the
oracle GS in the r5 sweep, while the r4 GS conformance fixed the same
instance on the base rung (rot=3, D=32, M=1024). Differences in play:
the ee=2 noise (1e-7, absent from GS conformance) shifting f32 luck, and
the GS `row_step` vs `row_records_prog` being separately-written site
bodies whose merge/selection could diverge. This probe holds platform,
instance, noise, rotation and gauges fixed and compares the two paths'
best energies: a systematic E0 gap (GS strictly below spectrum, same
settings) means a records-path beam defect; equal E0s mean the r4-vs-r5
difference was noise/platform luck.

CPU-runnable (f32 device programs execute anywhere); run per rotation:
  TNAX_PLATFORM=cpu python tools/r5_beam_gap_probe.py --L 2048 -k 26 --rot 3
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

import tnax
from spectrum_conformance import make_solver, solver_J_triples


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--L", type=int, default=2048)
    p.add_argument("-k", type=int, default=26)
    p.add_argument("--rot", type=int, nargs="*", default=[3])
    p.add_argument("--ee", type=int, default=2)
    p.add_argument("--noise", type=int, default=1,
                   help="0 = skip add_noise (the GS-conformance setup)")
    p.add_argument("--D", type=int, default=32)
    p.add_argument("--M", type=int, default=1024)
    args = p.parse_args()

    for rot in args.rot:
        out = {"instance": args.k, "rot": rot, "noise": bool(args.noise)}
        for path in ("gs", "spectrum"):
            ins = make_solver(args.L, args.k, args.ee if args.noise else 1)
            J = solver_J_triples(ins)
            if rot:
                ins.rotate_graph(rot=rot)
            ins.precondition(mode="balancing")
            t0 = time.time()
            if path == "gs":
                E = ins.search_ground_state(
                    M=args.M, relative_P_cutoff=1e-8, Dmax=args.D,
                    path="device")
                out["gs_E0"] = float(np.min(E))
                out["gs_recheck"] = float(
                    tnax.energy_Jij(J, ins.binary_states())[0])
            else:
                ins.search_low_energy_spectrum(
                    excitations_encoding=args.ee, M=args.M,
                    relative_P_cutoff=1e-8, Dmax=args.D, max_dEng=1.0,
                    path="device", cand_factor=8, auto_grow=True)
                ins.decode_low_energy_states(max_dEng=1.0, max_states=16)
                out["spec_E0"] = float(np.min(np.asarray(ins.energy)))
            out[f"{path}_s"] = round(time.time() - t0, 1)
        out["gap"] = round(out["spec_E0"] - out["gs_E0"], 9)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
