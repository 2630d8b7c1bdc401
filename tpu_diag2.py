"""Row-level bisect: run one compress_apply per row on the current backend
starting from the CPU-built boundary MPS, and compare against the CPU
result via normalized overlaps. The first row that diverges localizes the
backend-specific corruption."""
import os
import numpy as np
import tnax
import jax
import jax.numpy as jnp
from tnax.search import ContractionContext
from tnax import bmps

L = 512
Nx, Ny, Nc = 8, 8, 8
J = tnax.load_Jij(f'/root/reference/instances/Chimera_droplet_instances/chimera{L}_spinglass_power/001.txt')
J = tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)
ins = tnax.Solver(mode='Ising', Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=3)
gz = np.load('/root/repo/diag_gauges.npz')
ctx = ContractionContext(ins.problem, 3.0, gauges={k: gz[k] for k in gz.files})
print('backend:', jax.default_backend(), flush=True)

ref_file = '/root/repo/diag_rhoT_cpu32.npz'
if jax.default_backend() == 'cpu' and not os.path.exists(ref_file):
    ctx.build_boundary(32, 1e-16, 1e-10, 20, True)
    np.savez(ref_file, rhoT=np.asarray(ctx.rhoT))
    print('saved CPU rhoT reference', flush=True)

ref = jnp.asarray(np.load(ref_file)['rhoT'], ctx.dtype)  # (Ny+1, Nx, D, lv, D)
for ny in range(Ny - 1, -1, -1):
    start = bmps.MPS(A=ref[ny + 1], lognorm=jnp.zeros((), ctx.dtype))
    out, overlap, disc = bmps.compress_apply(
        start, ctx.Wt[ny], 32, conj=True, tolS=1e-16, tolV=1e-10,
        max_sweeps=20)
    num = bmps.mps_dot(ref[ny], out.A)
    den = jnp.sqrt(bmps.mps_dot(ref[ny], ref[ny])
                   * bmps.mps_dot(out.A, out.A))
    ov = float(num / den)
    print(f'row {ny}: overlap(backend_out, cpu_ref) = {ov:+.8f} '
          f'disc={float(disc):.2e}', flush=True)
