import time, numpy as np
import tnax, jax
print('backend:', jax.default_backend(), flush=True)
J = tnax.load_Jij('/root/reference/instances/Chimera_droplet_instances/chimera128_spinglass_power/001.txt')
J = tnax.round_Jij(tnax.Jij_f2p(J), 1/75)
# sampling
ins = tnax.Solver(mode='Ising', Nx=4, Ny=4, Nc=8, J=J, beta=3)
ins.precondition(mode='balancing')
E = ins.gibbs_sampling(M=128, Dmax=32, seed=7)
err = np.max(np.abs(E - tnax.energy_Jij(J, ins.binary_states())))
print(f'sampling: n={len(E)} err={err:.2e} negP={ins.negative_probability:.1e}', flush=True)
# spectrum (all encodings)
for ee, rot in [(1,0),(2,2),(3,3)]:
    ins = tnax.Solver(mode='Ising', Nx=4, Ny=4, Nc=8, J=J, beta=3)
    if rot: ins.rotate_graph(rot=rot)
    if ee > 1: ins.add_noise(amplitude=1e-7)
    t0=time.time()
    ins.search_low_energy_spectrum(excitations_encoding=ee, M=1024, relative_P_cutoff=1e-8, Dmax=16, max_dEng=1.0)
    ins.decode_low_energy_states(max_dEng=1.0)
    errs = np.max(np.abs(tnax.energy_Jij(J, ins.binary_states()) - ins.energy))
    print(f'spectrum ee={ee} rot={rot}: n={len(ins.energy)} (expect 31) err={errs:.2e} {time.time()-t0:.1f}s', flush=True)
# J124 degeneracy on TPU f32
J2 = tnax.Jij_f2p(tnax.load_Jij('/root/reference/instances/Chimera_J124/C=8_J124/001.txt'))
ins = tnax.Solver(mode='Ising', Nx=8, Ny=8, Nc=8, J=J2, beta=0.75)
ins.precondition(mode='balancing')
Eng = ins.search_ground_state(M=4096, relative_P_cutoff=1e-8, Dmax=8)
print(f'J124: E={Eng[0]} deg={ins.degeneracy} (expect -2309/1152)', flush=True)
