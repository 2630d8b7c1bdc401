import numpy as np
import tnax
import jax, jax.numpy as jnp
print('backend:', jax.default_backend(), flush=True)
rng = np.random.default_rng(0)
m, n, vm, vn = 1024, 512, 100, 80
U0, _ = np.linalg.qr(rng.standard_normal((vm, vn)))
V0, _ = np.linalg.qr(rng.standard_normal((vn, vn)))
s = np.logspace(0, -7, vn)
A = np.zeros((m, n))
A[:vm, :vn] = (U0 * s) @ V0.T
A32 = jnp.asarray(A, jnp.float32)
U, S, Vh = jnp.linalg.svd(A32, full_matrices=False)
U, S, Vh = map(np.asarray, (U, S, Vh))
recon = np.linalg.norm((U * S) @ Vh - A) / np.linalg.norm(A)
# leakage of kept singular vectors into padded rows/cols
k = 64
leakU = np.abs(U[vm:, :k]).max()
leakV = np.abs(Vh[:k, vn:]).max()
print(f'svd: recon={recon:.2e} S[:3]={S[:3]} S[{vn-1}]={S[vn-1]:.2e} '
      f'S[{vn}]={S[vn]:.2e} leakU={leakU:.2e} leakV={leakV:.2e}', flush=True)
Q, R = jnp.linalg.qr(A32)
Q, R = np.asarray(Q), np.asarray(R)
qr_recon = np.linalg.norm(Q @ R - A) / np.linalg.norm(A)
leakR = np.abs(R[:, vn:]).max()   # R columns beyond valid cols
leakR2 = np.abs(R[vn:, :]).max()  # R rows beyond rank
print(f'qr: recon={qr_recon:.2e} leakR_cols={leakR:.2e} '
      f'leakR_rows={leakR2:.2e}', flush=True)
# scan-context: same ops inside lax.scan
def step(c, x):
    u, ss, vh = jnp.linalg.svd(x, full_matrices=False)
    return c, ss[:3]
_, out = jax.lax.scan(step, 0.0, jnp.stack([A32, A32]))
print('scan svd S[:3]:', np.asarray(out)[0], flush=True)
