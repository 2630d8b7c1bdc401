import time, numpy as np
import tnax, jax
from tnax import parallel
print('backend:', jax.default_backend(), flush=True)
SH = {512:(8,8,8), 2048:(16,16,8)}
REF = {512: -846.96, 2048: -3336.773333}
for L in [512, 2048]:
    Nx,Ny,Nc = SH[L]
    J = tnax.load_Jij(f'/root/reference/instances/Chimera_droplet_instances/chimera{L}_spinglass_power/001.txt')
    J = tnax.round_Jij(tnax.Jij_f2p(J), 1/75)
    for it in range(3):
        ins = tnax.Solver(mode='Ising', Nx=Nx, Ny=Ny, Nc=Nc, J=J, beta=3)
        t0=time.time()
        ins.precondition(mode='balancing')
        tp = time.time()-t0
        ctx = ins._context()
        t0=time.time()
        r = parallel.device_search_gs(ctx, M=1024, relative_P_cutoff=1e-8, Dmax=32)
        ins.states = r['states'][None, :][:, ins.order]
        E = tnax.energy_Jij(J, ins.binary_states())[0]
        print(f'device L{L} it{it}: pre={tp:.1f}s search={time.time()-t0:.1f}s E={E:.6f} (ref {REF[L]}) negP={r["negative_probability"]:.1e}', flush=True)
