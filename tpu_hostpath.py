import time
import tnax, jax
from tnax import search as S
print('backend:', jax.default_backend(), flush=True)
J = tnax.load_Jij('/root/reference/instances/Chimera_droplet_instances/chimera512_spinglass_power/001.txt')
J = tnax.round_Jij(tnax.Jij_f2p(J), 1/75)
ins = tnax.Solver(mode='Ising', Nx=8, Ny=8, Nc=8, J=J, beta=3)
ins.precondition(mode='balancing')
ctx = ins._context()
for it in range(2):
    t0 = time.time()
    res = S.search_ground_state(ctx, M=1024, relative_P_cutoff=1e-8, Dmax=32)
    print(f'host GS L512 it{it}: {time.time()-t0:.1f}s E={res.energy[0]:.4f}', flush=True)
import numpy as np
ins2 = tnax.Solver(mode='Ising', Nx=8, Ny=8, Nc=8, J=J, beta=3)
ins2.add_noise(amplitude=1e-7)
ins2.precondition(mode='balancing')
for it in range(2):
    t0 = time.time()
    ins2.search_low_energy_spectrum(excitations_encoding=2, M=1024, relative_P_cutoff=1e-8, Dmax=32, max_dEng=1.0)
    print(f'spectrum L512 it{it}: {time.time()-t0:.1f}s n={len(ins2.energy)}', flush=True)
