"""Re-run the host-agreement check for instances whose shipped sweep
record says host_ok=false (one-off repair for records written before
host_agreement learned to walk the ladder frames, commit a8ef990).

The device spectrum is re-derived at the instance's ACCEPTED escalation
frame (the rot recorded in the sweep JSONL), re-checked against the GS
oracle, and then the (ladder-walking) host agreement runs. The corrected
record is appended to the JSONL as {"instance": k, "host_recheck": true,
...} — sweep summaries take the last record per instance.

Usage: python tools/r5_host_recheck.py results/r5_spectrum_L2048.jsonl
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from spectrum_conformance import (check_spectrum, droplet_oracle,
                                  host_agreement, make_solver,
                                  solver_J_triples, spectrum_ladder)

def main(path, ee=2, D=32, M=1024, max_dEng=1.0, max_states=1024):
    last = {}
    for line in open(path):
        r = json.loads(line)
        if "instance" in r and "n_states" in r:
            last[r["instance"]] = r
    todo = [(k, r) for k, r in sorted(last.items())
            if r.get("host_ok") is False]
    if not todo:
        print(json.dumps({"host_recheck_todo": 0}), flush=True)
        return
    L = int(path.rsplit("L", 1)[1].split(".")[0].split("_")[0])
    oracle = droplet_oracle(L)
    for k, r in todo:
        rot = r.get("rot", 0)
        # the accepted frame: reconstruct zipup_rsvd/D/M from esc_wave
        wave = (spectrum_ladder()[r["esc_wave"]] if "esc_wave" in r
                else dict(rot=rot))
        ins = make_solver(L, k, ee)
        J_orig = solver_J_triples(ins)
        if wave.get("rot"):
            ins.rotate_graph(rot=wave["rot"])
        ins.precondition(mode="balancing")
        ins.search_low_energy_spectrum(
            excitations_encoding=ee, M=M * wave.get("M_mul", 1),
            relative_P_cutoff=1e-8, Dmax=wave.get("D", D),
            max_dEng=max_dEng, path="device", cand_factor=8,
            auto_grow=True, zipup_rsvd=wave.get("zipup_rsvd"))
        chk, E_dev = check_spectrum(ins, J_orig, oracle[k], max_dEng,
                                    max_states)
        rec = dict(instance=k, host_recheck=True, rot=wave.get("rot", 0),
                   gs_ok=chk["gs_ok"])
        rec.update(host_agreement(L, k, ee, wave.get("D", D),
                                  M * wave.get("M_mul", 1), max_dEng,
                                  max_states, E_dev,
                                  rot=wave.get("rot", 0),
                                  zipup_rsvd=wave.get("zipup_rsvd")))
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
