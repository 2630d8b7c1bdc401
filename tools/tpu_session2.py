"""TPU session: device-record spectrum validation + J124 C12 D=48 breadth.

Single process (compiles are not cached across processes over the axon
tunnel). Covers:
  1. L512 device-record spectrum ee=2 (warm timing vs the 11.0 s
     host-orchestrated number), decode + independent energy recheck,
     negative-probability audit (f32 stability telemetry).
  2. L512 host-path spectrum in the same process for a decoded-spectrum
     cross-check (count + energies).
  3. L2048 device-record spectrum ee=2 — f32 audit at scale.
  4. J124 C=12 instances 2-4 at the reference operating point (D=48,
     M=4096, 4 rotations) vs the shipped degeneracy oracle.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import tnax

INST = os.environ.get("TNAX_INSTANCES", "/root/reference/instances")
failures = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'} {name} {detail}", flush=True)
    if not ok:
        failures.append(name)


def load_droplet(L, instance=1):
    J = tnax.load_Jij(os.path.join(
        INST, "Chimera_droplet_instances",
        f"chimera{L}_spinglass_power", "%03d.txt" % instance))
    return tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)


def spectrum(J, shape, ee, path, seed=7, **kw):
    Nx, Ny, Nc = shape
    ins = tnax.Solver(mode="Ising", Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=3)
    np.random.seed(seed)
    ins.add_noise(amplitude=1e-7)
    ins.precondition(mode="balancing")
    t0 = time.time()
    ins.search_low_energy_spectrum(excitations_encoding=ee, M=1024,
                                   relative_P_cutoff=1e-8, Dmax=32,
                                   max_dEng=1.0, path=path, **kw)
    dt = time.time() - t0
    negp = ins.negative_probability
    ins.decode_low_energy_states(max_dEng=1.0)
    err = np.max(np.abs(tnax.energy_Jij(J, ins.binary_states())
                        - ins.energy))
    return ins, dt, err, negp


def main():
    import jax
    print("backend:", jax.default_backend(), flush=True)

    # --- 1+2: L512 spectrum, device-record vs host path ------------------
    J = load_droplet(512)
    for it in range(2):
        dev, dt, err, negp = spectrum(J, (8, 8, 8), 2, "device")
        check(f"spectrum L512 device it{it}",
              err < 1e-3 and len(dev.energy) >= 1,
              f"{dt:.1f}s n={len(dev.energy)} E0={dev.energy[0]:.4f} "
              f"err={err:.1e} negP={negp:.1e}")
    host, dt, err, negp = spectrum(J, (8, 8, 8), 2, "host")
    check("spectrum L512 host", err < 1e-3,
          f"{dt:.1f}s n={len(host.energy)} E0={host.energy[0]:.4f} "
          f"err={err:.1e} negP={negp:.1e}")
    nd, nh = len(dev.energy), len(host.energy)
    k = min(nd, nh)
    de = np.max(np.abs(np.sort(dev.energy)[:k] - np.sort(host.energy)[:k]))
    check("spectrum L512 device==host",
          abs(nd - nh) <= max(2, 0.1 * nh) and de < 1e-2,
          f"n_dev={nd} n_host={nh} maxdE(first {k})={de:.1e}")

    # --- 3: L2048 device spectrum (f32 audit at scale) --------------------
    J = load_droplet(2048)
    for it in range(2):
        dev, dt, err, negp = spectrum(J, (16, 16, 8), 2, "device")
        check(f"spectrum L2048 device it{it}", err < 1e-2,
              f"{dt:.1f}s n={len(dev.energy)} E0={dev.energy[0]:.4f} "
              f"err={err:.1e} negP={negp:.1e}")

    # --- 4: J124 C12 instances 2-4 at the reference op point --------------
    oracle = {}
    with open(os.path.join(INST, "Chimera_J124", "C=12_J124",
                           "results_J124_C12.txt")) as f:
        for line in f:
            p = line.split()
            if p and p[0].isdigit():
                oracle[int(p[0])] = (float(p[1]), int(float(p[2])))
    for ins_no in (2, 3, 4):
        J = tnax.Jij_f2p(tnax.load_Jij(os.path.join(
            INST, "Chimera_J124", "C=12_J124", "%03d.txt" % ins_no)))
        best, deg = 1e9, 0
        t00 = time.time()
        for rot in range(4):
            ins = tnax.Solver(mode="Ising", Nx=12, Ny=12, Nc=8, J=J,
                              beta=0.75)
            if rot:
                ins.rotate_graph(rot=rot)
            ins.precondition(mode="balancing")
            E = ins.search_ground_state(M=4096, relative_P_cutoff=1e-8,
                                        Dmax=48)
            if E[0] < best - 1e-9:
                best, deg = E[0], ins.degeneracy
            elif abs(E[0] - best) < 1e-9:
                deg = max(deg, ins.degeneracy)
        oE, odeg = oracle[ins_no]
        check(f"J124 C12 #{ins_no} D=48",
              abs(best - oE) < 1e-9 and deg == odeg,
              f"E={best} deg={deg} oracle=({oE},{odeg}) "
              f"{time.time()-t00:.0f}s")

    print(("ALL PASS" if not failures else f"FAILURES: {failures}"),
          flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
