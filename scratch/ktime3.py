import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from hoomd_tpu.ops.pallas_pair import cell_pair_planar_n3l, build_cell_shifts
from hoomd_tpu._config import PAD_COORD

N, L = 64000, 42.353
pv = jnp.asarray([6.25, 0.0163, 4.0, 4.0, 2.5], jnp.float32)

def bench(cd, C, reps=40):
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
    @jax.jit
    def chain(p, n):
        def body(_, p):
            F = cell_pair_planar_n3l(p, cd, sh, pv, C=C, eval_name='lj', pnames=('lj1','lj2','rcut'))
            return p + 1e-12 * F
        return jax.lax.fori_loop(0, n, body, p)
    o = chain(pos, reps); jax.block_until_ready(o)
    t0=time.perf_counter(); o=chain(pos, reps); jax.block_until_ready(o)
    dt = (time.perf_counter()-t0)/reps*1e3
    print(f"cd={cd} C={C:3d} slots={nc*C:7d}  {dt:7.3f} ms")

for cd, C in (((14,14,14),40), ((13,13,14),40), ((13,13,13),40),
              ((14,14,14),32), ((15,15,15),32), ((16,16,16),24),
              ((12,13,13),40)):
    bench(cd, C)
