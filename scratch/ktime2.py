import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from hoomd_tpu.ops.pallas_pair import (cell_pair_planar_n3l, cell_pair_planar, build_cell_shifts)
from hoomd_tpu._config import PAD_COORD

cd, C, N, L = (14,14,14), 40, 64000, 42.353
nc = cd[0]*cd[1]*cd[2]
rng = np.random.RandomState(0)
occ = N // nc
pos = np.full((nc, C, 3), float(PAD_COORD), np.float32)
w = L/np.array(cd)
ids = np.arange(nc)
org = np.stack([ids%cd[0]*w[0], ids//cd[0]%cd[1]*w[1], ids//(cd[0]*cd[1])*w[2]], -1) - L/2
pos[:, :occ, :] = org[:,None,:] + rng.rand(nc, occ, 3).astype(np.float32)*w
pos = jnp.asarray(pos)
sh = jnp.asarray(build_cell_shifts(cd, (L,)*3)[1], jnp.float32)
pv = jnp.asarray([6.25, 0.0163, 4.0, 4.0, 2.5], jnp.float32)

f = lambda p: cell_pair_planar_n3l(p, cd, sh, pv, C=C, eval_name='lj', pnames=('lj1','lj2','rcut'))
o = f(pos); jax.block_until_ready(o)
print("finite:", bool(jnp.all(jnp.isfinite(o))), "Fsum", float(jnp.sum(jnp.abs(o))))
# one call
t0=time.perf_counter(); o=f(pos); jax.block_until_ready(o); print("one call", (time.perf_counter()-t0)*1e3, "ms")
# chained: p depends on previous output (forces serialization)
@jax.jit
def chain(p, n):
    def body(_, p):
        F = cell_pair_planar_n3l(p, cd, sh, pv, C=C, eval_name='lj', pnames=('lj1','lj2','rcut'))
        return p + 1e-12 * F
    return jax.lax.fori_loop(0, n, body, p)
o = chain(pos, 50); jax.block_until_ready(o)
t0=time.perf_counter(); o=chain(pos, 50); jax.block_until_ready(o)
print("chained per call", (time.perf_counter()-t0)/50*1e3, "ms")
