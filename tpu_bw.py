import time, numpy as np
import tnax, jax, jax.numpy as jnp
print('backend:', jax.default_backend(), flush=True)
for size_mb, shape in [(1, (256, 1024)), (8, (2048, 1024)), (64, (16384, 1024))]:
    x = jnp.ones(shape, jnp.float32)
    x.block_until_ready()
    t0 = time.time()
    for _ in range(5):
        np.asarray(x)
    dt = (time.time() - t0) / 5
    print(f'D2H {size_mb}MB: {dt*1000:.1f} ms -> {size_mb/dt:.1f} MB/s', flush=True)
