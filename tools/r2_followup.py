"""Round-2 follow-up TPU driver: all (16,16,8)-shaped work in ONE process.

The axon remote-compile tunnel does not serialize to the persistent jit
cache, so every fresh process pays minutes of compiles. The three remaining
round-2 jobs all use the same (Nx,Ny,Nc)=(16,16,8) padded shapes, so one
process amortizes a single compile set across:

  1. droplet L2048 escalation retries for the first-pass misses
     (rotation ladder, then the reference's D=48 operating point with a
     doubled beam — examples/e01 default, VERDICT.md next-round item 2)
  2. the L2048 ee=2 device-record spectrum rerun with auto_grow until
     merge_overflow == 0 (VERDICT.md next-round item 5a), decoded energies
     cross-checked against tnax.energy_Jij
  3. the J124 C=16 ensemble conformance sweep (200 instances, D=48)

Outputs: results/droplet_L2048_retry.jsonl, results/spectrum_L2048.json,
results/j124_C16.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tnax
from conformance import run_droplet, run_j124  # noqa: E402

RESULTS = os.path.join(os.path.dirname(__file__), "..", "results")


def retry_l2048(misses):
    out = []
    with open(os.path.join(RESULTS, "droplet_L2048_retry.jsonl"), "w") as f:
        for k in misses:
            res = run_droplet(2048, k, 32, 1024, "device", True, start=k,
                              escalate=True)
            for r in res:
                f.write(json.dumps(r) + "\n")
                f.flush()
            out += res
    return out


def spectrum_l2048():
    J = tnax.load_Jij(
        "/root/reference/instances/Chimera_droplet_instances/"
        "chimera2048_spinglass_power/001.txt")
    J = tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)
    ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J, beta=3)
    np.random.seed(7)
    ins.add_noise(amplitude=1e-7)
    ins.precondition(mode="balancing")
    t0 = time.time()
    ins.search_low_energy_spectrum(excitations_encoding=2, M=1024,
                                   relative_P_cutoff=1e-8, Dmax=32,
                                   max_dEng=1.0, path="device",
                                   auto_grow=True)
    dt = time.time() - t0
    ins.decode_low_energy_states(max_dEng=1.0)
    err = float(np.max(np.abs(tnax.energy_Jij(J, ins.binary_states())
                              - ins.energy)))
    rec = dict(seconds=round(dt, 2), n_states=int(len(ins.energy)),
               E0=float(ins.energy[0]),
               decode_err=err,
               merge_overflow=int(ins.merge_overflow),
               count_max=int(getattr(ins, "count_max", 0)),
               negative_probability=float(ins.negative_probability))
    with open(os.path.join(RESULTS, "spectrum_L2048.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print("# spectrum_L2048:", json.dumps(rec), flush=True)
    return rec


def gs_timing():
    """Warm L2048 GS wall-clock at the bench operating point (D=32, M=1024,
    P=1e-8, precondition included) — the BENCH metric, measured in-process
    where compiles are already amortized."""
    J = tnax.load_Jij(
        "/root/reference/instances/Chimera_droplet_instances/"
        "chimera2048_spinglass_power/001.txt")
    J = tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)
    from tnax import parallel
    times = []
    for it in range(3):
        t0 = time.time()
        ins = tnax.Solver(mode="Ising", Nx=16, Ny=16, Nc=8, J=J, beta=3)
        ins.precondition(mode="balancing")
        ctx = ins._context()
        r = parallel.device_search_gs(ctx, M=1024, relative_P_cutoff=1e-8,
                                      Dmax=32)
        ins.states = r["states"][None, :][:, ins.order]
        E = float(tnax.energy_Jij(J, ins.binary_states())[0])
        times.append(round(time.time() - t0, 2))
    rec = dict(times=times, warm=min(times), E=E,
               match=bool(abs(E + 3336.77333333) < 1e-4),
               vs_ref=round(318.31 / min(times), 1))
    with open(os.path.join(RESULTS, "bench_probe.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print("# gs_timing:", json.dumps(rec), flush=True)


def c16_sweep(n=200):
    path = os.path.join(RESULTS, "j124_C16.jsonl")
    done = 0
    if os.path.exists(path):
        done = sum(1 for line in open(path) if line.startswith("{"))
    import contextlib
    with open(path, "a", buffering=1) as f, \
            contextlib.redirect_stdout(f):
        res = run_j124(16, n, 48, 4096, True, path="device", start=done + 1)
    return res


def main():
    only = os.environ.get("R2_STAGES", "retry,spectrum,bench,c16").split(",")
    if "retry" in only:
        print("== stage 1: L2048 escalation retries ==", flush=True)
        retry_l2048([26, 98, 99])
    if "spectrum" in only:
        print("== stage 2: L2048 spectrum rerun (auto_grow) ==", flush=True)
        spectrum_l2048()
    if "bench" in only:
        print("== stage 2b: warm L2048 GS timing ==", flush=True)
        gs_timing()
    if "c16" in only:
        print("== stage 3: J124 C16 ensemble ==", flush=True)
        c16_sweep()


if __name__ == "__main__":
    main()
