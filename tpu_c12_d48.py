import time, numpy as np
import tnax, jax
print('backend:', jax.default_backend(), flush=True)
J = tnax.Jij_f2p(tnax.load_Jij('/root/reference/instances/Chimera_J124/C=12_J124/001.txt'))
best, deg = 1e9, 0
t00 = time.time()
for rot in range(4):
    ins = tnax.Solver(mode='Ising', Nx=12, Ny=12, Nc=8, J=J, beta=0.75)
    if rot: ins.rotate_graph(rot=rot)
    ins.precondition(mode='balancing')
    t0 = time.time()
    E = ins.search_ground_state(M=4096, relative_P_cutoff=1e-8, Dmax=48)
    print(f'rot {rot}: E={E[0]} deg={ins.degeneracy} {time.time()-t0:.1f}s', flush=True)
    if E[0] < best - 1e-9: best, deg = E[0], ins.degeneracy
    elif abs(E[0]-best) < 1e-9: deg = max(deg, ins.degeneracy)
print(f'tnax C12#1 D=48 M=4096: E={best} deg={deg} (oracle -5260/36864) total={time.time()-t00:.0f}s', flush=True)
