"""Benchmark: chimera ground-state search wall-clock vs the reference CPU.

Runs the flagship workload — GS search on a chimera droplet instance at
D=32, M=1024, P=1e-8, the reference's operating point (reference
`examples/e01_search_gs_droplet_instances.py:22-26`) — and prints ONE JSON
line:

    {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

``vs_baseline`` is the speedup over the reference implementation measured on
this machine's CPU by running the reference's own e01 (BASELINE.md /
ref_baseline_partial.json). On an accelerator the device-resident search
(`tnax.parallel.device_search_gs`) is used — the beam never leaves the chip;
the reported energy is recomputed exactly on the host from the returned
state and must match the reference ground truth. The first compile through
the axon remote-compile tunnel is minutes-long (not cacheable across
processes); the reported value is the steady-state (warm) wall-clock, cold
time in the JSON side channel.

Env knobs: TNAX_BENCH_L (128|512|1152|2048, default 2048),
TNAX_BENCH_D (default 32), TNAX_BENCH_M (default 1024),
TNAX_BENCH_PATH (device|host, default device on accelerators).
"""

import json
import os
import sys
import time

import tnax
from tnax import parallel

SHAPES = {128: (4, 4, 8), 512: (8, 8, 8), 1152: (12, 12, 8),
          2048: (16, 16, 8)}

# reference wall-clock measured on this machine (reference examples/e01,
# rot=0, D=32, M=1024, precondition=True) — see BASELINE.md
REF_SECONDS = {128: 3.56, 512: 51.33, 1152: 184.56, 2048: 318.31}
REF_ENERGY = {128: -210.93333333, 512: -846.96, 1152: -1881.22666667,
              2048: -3336.77333333}


def main():
    L = int(os.environ.get("TNAX_BENCH_L", "2048"))
    D = int(os.environ.get("TNAX_BENCH_D", "32"))
    M = int(os.environ.get("TNAX_BENCH_M", "1024"))
    import jax
    backend = jax.default_backend()
    path = os.environ.get("TNAX_BENCH_PATH",
                          "host" if backend == "cpu" else "device")

    Nx, Ny, Nc = SHAPES[L]
    J = tnax.load_Jij(
        "/root/reference/instances/Chimera_droplet_instances/"
        f"chimera{L}_spinglass_power/001.txt")
    J = tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=3)

    def once():
        t0 = time.time()
        ins._gauges = None
        ins.precondition(mode="balancing")  # f32 stability at beta=3
        ctx = ins._context()
        if path == "device":
            res = parallel.device_search_gs(ctx, M=M,
                                            relative_P_cutoff=1e-8, Dmax=D)
            states = res["states"][None, :]
        else:
            from tnax import search as S
            res = S.search_ground_state(ctx, M=M, relative_P_cutoff=1e-8,
                                        Dmax=D)
            states = res.states[:1]
        dt = time.time() - t0
        # exact host-side energy of the found state
        ins.states = states[:, ins.order]
        E = float(tnax.energy_Jij(J, ins.binary_states())[0])
        return dt, E

    from tnax.profiling import trace
    cold, E1 = once()
    with trace(os.environ.get("TNAX_PROFILE")):
        warm, E = once()
    ok = abs(E - REF_ENERGY[L]) < 1e-4
    # marginal evaluations per second (the north-star throughput metric):
    # every site of the lattice evaluates M x N_block conditional weights
    evals = M * 256 * Nx * Ny / warm
    print(f"# backend={backend} path={path} L={L} D={D} M={M} "
          f"cold={cold:.1f}s warm={warm:.1f}s E={E:.8f} ref={REF_ENERGY[L]} "
          f"match={ok}", file=sys.stderr)
    print(json.dumps({
        "metric": f"chimera L={L} GS-search wall-clock at D={D} (warm)",
        "value": round(warm, 3),
        "unit": "s",
        "vs_baseline": round(REF_SECONDS[L] / warm, 3),
        "energy_matches_reference": bool(ok),
        "energy": E,
        "cold_s": round(cold, 3),
        "marginal_evals_per_s": round(evals),
        "backend": backend,
        "path": path,
    }))


if __name__ == "__main__":
    main()
