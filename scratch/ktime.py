import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from hoomd_tpu.ops.pallas_pair import (cell_pair_planar_n3l, cell_pair_planar,
                                       build_cell_shifts)
from hoomd_tpu._config import PAD_COORD

def mk(cd, C, N=64000, L=42.353):
    rng = np.random.RandomState(0)
    nc = cd[0]*cd[1]*cd[2]
    # synthetic cell-major layout at the right occupancy
    occ = N // nc
    pos = np.full((nc, C, 3), PAD_COORD, np.float32)
    w = L/np.array(cd)
    ids = np.arange(nc)
    org = np.stack([ids%cd[0]*w[0], ids//cd[0]%cd[1]*w[1], ids//(cd[0]*cd[1])*w[2]], -1) - L/2
    pos[:, :occ, :] = org[:,None,:] + rng.rand(nc, occ, 3).astype(np.float32)*w
    return jnp.asarray(pos)

def t(name, f, *a, reps=30, **k):
    o = f(*a, **k); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(reps): o=f(*a,**k)
    jax.block_until_ready(o)
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:7.3f} ms")

pv = jnp.asarray([6.25, 0.0163, 4.0, 4.0, 2.5], jnp.float32)  # rc2,eshift,lj1,lj2,rcut
for cd, C in (((14,14,14),40), ((13,13,14),40), ((13,13,13),40), ((15,15,15),32), ((14,14,14),32)):
    nc = cd[0]*cd[1]*cd[2]
    pos = mk(cd, C)
    sh = jnp.asarray(build_cell_shifts(cd, (42.353,)*3)[1], jnp.float32)
    t(f"n3l cd={cd} C={C}", cell_pair_planar_n3l, pos, cd, sh, pv,
      C=C, eval_name='lj', pnames=('lj1','lj2','rcut'))
