"""Bisect TPU-vs-CPU f32 divergence: compare Wt, rhoT spectra, marginals."""
import os
import numpy as np

import tnax
import jax
import jax.numpy as jnp
from tnax.search import ContractionContext
from tnax import engine

L = 512
Nx, Ny, Nc = 8, 8, 8
J = tnax.load_Jij(f'/root/reference/instances/Chimera_droplet_instances/chimera{L}_spinglass_power/001.txt')
J = tnax.round_Jij(tnax.Jij_f2p(J), 1 / 75)
ins = tnax.Solver(mode='Ising', Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=3)
gz = np.load('/root/repo/diag_gauges.npz')
gauges = {k: gz[k] for k in gz.files}
ctx = ContractionContext(ins.problem, 3.0, gauges=gauges)
print('backend:', jax.default_backend(), 'dtype:', ctx.dtype,
      'matmul precision:', jax.config.jax_default_matmul_precision, flush=True)

out = {}
out['Wt'] = np.asarray(ctx.Wt[0, 0])           # elementwise only
ctx.build_boundary(32, 1e-16, 1e-10, 20, True)
rhoT = np.asarray(ctx.rhoT)
out['rhoT_overlap'] = ctx.rhoT_overlap
# gauge-invariant: singular values of each site matrix of row 1
sv = []
for nx in range(Nx):
    A = rhoT[1, nx].reshape(32 * 16, 32)
    sv.append(np.linalg.svd(A, compute_uv=False)[:8])
out['sv_row1'] = np.array(sv)
# marginal at site (0,0) for the trivial branch
M = 4
RL = jnp.zeros((M, 32), ctx.dtype).at[:, 0].set(1.0)
uidx0 = jnp.zeros((M, Nx), jnp.int32)
RRs = engine.row_right_envs(ctx.rhoT[1], ctx.Wt[0], uidx0)
Pn, mPn = engine.marginal_step(ctx.lB[0, 0], ctx.drindex[0, 0], ctx.rhoT[1, 0],
                               RL, RRs[0], jnp.zeros(M, jnp.int32),
                               jnp.zeros(M, jnp.int32), 256)
out['Pn00'] = np.asarray(Pn[0])
out['mPn'] = float(np.asarray(mPn[0]))
tag = os.environ.get('TAG', jax.default_backend())
np.savez(f'/root/repo/diag_{tag}.npz', **out)
print('saved diag_%s.npz  mPn=%.3e  Pn_top5=%s' %
      (tag, out['mPn'], np.sort(out['Pn00'])[-5:]), flush=True)
