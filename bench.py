"""Benchmark: chimera ground-state search wall-clock vs the reference CPU.

Runs the flagship workload (GS search on a chimera droplet instance at
D=32, M=1024, P=1e-8 — the reference's operating point, reference
`examples/e01_search_gs_droplet_instances.py:22-26`) on the available
backend and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

``vs_baseline`` is the speedup over the reference implementation measured
on this machine's CPU (ref_baseline_partial.json, produced by running the
reference's own e01; see BASELINE.md). The first TPU compile of the
contraction pipeline is minutes-long through the remote-compile tunnel and
is persisted in a compilation cache; the reported value is the steady-state
(warm) wall-clock, with cold time in the side channel stderr log.

Env knobs: TNAX_BENCH_L (128|512|1152|2048, default 2048),
TNAX_BENCH_D (default 32), TNAX_BENCH_M (default 1024).
"""

import json
import os
import sys
import time

import numpy as np

import tnax

SHAPES = {128: (4, 4, 8), 512: (8, 8, 8), 1152: (12, 12, 8),
          2048: (16, 16, 8)}

# reference wall-clock measured on this machine (examples/e01, rot=0, D=32,
# M=1024, precondition=True) — see ref_baseline_partial.json / BASELINE.md
REF_SECONDS = {128: 3.56, 512: 51.33, 1152: 184.56, 2048: 318.31}
REF_ENERGY = {128: -210.93333333, 512: -846.96, 1152: -1881.22666667,
              2048: -3336.77333333}


def run(L, D, M, instance=1):
    path = ("/root/reference/instances/Chimera_droplet_instances/"
            f"chimera{L}_spinglass_power/%03d.txt" % instance)
    Nx, Ny, Nc = SHAPES[L]
    J = tnax.load_Jij(path)
    J = tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)

    def once():
        t0 = time.time()
        ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=3)
        ins.precondition(mode="balancing")
        Eng = ins.search_ground_state(M=M, relative_P_cutoff=1e-8, Dmax=D)
        return time.time() - t0, float(Eng[0]), ins

    cold, E1, _ = once()
    warm, E2, ins = once()
    return cold, warm, E2, ins


def main():
    L = int(os.environ.get("TNAX_BENCH_L", "2048"))
    D = int(os.environ.get("TNAX_BENCH_D", "32"))
    M = int(os.environ.get("TNAX_BENCH_M", "1024"))
    import jax
    backend = jax.default_backend()
    cold, warm, E, ins = run(L, D, M)
    ok = abs(E - REF_ENERGY[L]) < 1e-4
    print(f"# backend={backend} L={L} D={D} M={M} cold={cold:.1f}s "
          f"warm={warm:.1f}s E={E:.8f} ref={REF_ENERGY[L]} match={ok} "
          f"negP={ins.negative_probability:.2e}", file=sys.stderr)
    ref = REF_SECONDS[L]
    print(json.dumps({
        "metric": f"chimera L={L} GS-search wall-clock at D={D} (warm)",
        "value": round(warm, 3),
        "unit": "s",
        "vs_baseline": round(ref / warm, 3),
        "energy_matches_reference": bool(ok),
        "cold_s": round(cold, 3),
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
