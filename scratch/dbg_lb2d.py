import os
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','') + ' --xla_force_host_platform_device_count=8'
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_platforms', 'cpu')
from jax.sharding import Mesh
import sys; sys.path.insert(0, '/root/repo')
from hoomd_tpu.parallel.spatial2d import build_spatial2d_lj_md
mesh = Mesh(np.array(jax.devices()[:8]).reshape(2,4), ('domain_y','domain_x'))
rng = np.random.RandomState(5)
L = 32.0
pd = np.stack([rng.uniform(-L/2, 0, 384), rng.uniform(-L/2, L/2, 384), rng.uniform(-L/2, L/2, 384)], axis=1)
pu = rng.uniform(-L/2, L/2, (128,3))
pos0 = np.concatenate([pd, pu]); vel0 = np.zeros_like(pos0)
step_fn, init_fn, run_steps, gather_fn, rebalance_until = build_spatial2d_lj_md(mesh, len(pos0), L, dt=0.0, rcut=2.5, r_buff=0.4, slot_cap=512, ghost_cap=512)
carry = init_fn(pos0, vel0)

def imb(carry):
    pos, vel, frc, tag, ts, cx, cy = carry
    pos_h, tag_h = np.asarray(pos), np.asarray(tag)
    sel = tag_h >= 0
    x, y = pos_h[sel,0], pos_h[sel,1]
    cxh, cyh = np.asarray(cx), np.asarray(cy)
    nx = np.array([np.sum((x>=cxh[s])&(x<cxh[s+1])) for s in range(4)], float)
    ny = np.array([np.sum((y>=cyh[s])&(y<cyh[s+1])) for s in range(2)], float)
    return nx, ny, max(np.abs(nx/nx.mean()-1).max(), np.abs(ny/ny.mean()-1).max())

nx, ny, i0 = imb(carry)
print("before:", nx, ny, i0, flush=True)
carry = rebalance_until(carry, tol=0.10, max_iters=30)
nx, ny, i1 = imb(carry)
print("after:", nx, ny, i1, flush=True)
print("cuts_x:", np.asarray(carry[5]), flush=True)
