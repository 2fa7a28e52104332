"""Kernel-only microbench of cell_megastep_planes at the production 64k config."""
import time, sys, functools
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from hoomd_tpu.ops.fast_lj import plan_fast_lj
from hoomd_tpu.ops import pallas_pair as pp

N = 64000
rho = 0.8442
L = (N / rho) ** (1/3)
rcut, rbuff = 2.5, 0.4
cell_dim, nc, C = plan_fast_lj(N, (L, L, L), rcut, rbuff)
print("cell_dim", cell_dim, "nc", nc, "C", C, "slots", nc*C)
nx, ny, nz = cell_dim

rng = np.random.RandomState(0)
# fill cells with ~mean occupancy random local positions
pos = np.full((nc, C, 3), 1e9, np.float32)
occ = N // nc
wid = np.array([L/nx, L/ny, L/nz])
ids = np.arange(nc)
ctr = np.stack([(ids % nx + 0.5)*wid[0], ((ids//nx) % ny + 0.5)*wid[1], (ids//(nx*ny) + 0.5)*wid[2]], -1) - L/2
for c in range(nc):
    pos[c, :occ] = ctr[c] + rng.uniform(-0.5, 0.5, (occ, 3)) * wid
vel = np.zeros((nc, C, 3), np.float32)
frc = np.zeros((nc, C, 3), np.float32)
mass = np.ones((nc, C), np.float32)
minv = np.ones((nc, C), np.float32)

from hoomd_tpu.ops.pallas_pair import build_cell_shifts
_, shift = build_cell_shifts(cell_dim, (L, L, L))
shift = shift.astype(np.float32)
params = jnp.asarray([rcut*rcut, 0.0, 4.0, 4.0], jnp.float32)  # rc2, eshift, lj1, lj2
kt = jnp.full((8,), 1.2, jnp.float32)

def planes(a):
    return jnp.transpose(jnp.asarray(a).reshape(nz, ny, nx, C, 3), (4, 0, 1, 2, 3))
gp, gv, gf = planes(pos), planes(vel), planes(frc)
gw = jnp.asarray(minv).reshape(nz, ny, nx, C)
gm = jnp.asarray(mass).reshape(nz, ny, nx, C)
shift = jnp.asarray(shift)

def bench(tag, **kw):
    k = 8
    f = functools.partial(pp.cell_megastep_planes, cell_dim=cell_dim, C=C, k=k,
                          method='nvt', ndof=3*N-3, tau_inv2=4.0, **kw)
    t0 = time.perf_counter()
    out = f(gp, gv, gf, gw, gm, gp, cell_shift=shift, params_vec=params, dt=0.005, kt_table=kt, xi=0.0, eta=0.0, skin=0.4)
    ke = float(out[6])   # force host fetch (honest timing)
    t_compile = time.perf_counter() - t0
    # warm
    for _ in range(2):
        out = f(gp, gv, gf, gw, gm, gp, cell_shift=shift, params_vec=params, dt=0.005, kt_table=kt, xi=0.0, eta=0.0, skin=0.4)
        float(out[6])
    reps = 10
    t0 = time.perf_counter()
    o = None
    for _ in range(reps):
        o = f(gp, gv, gf, gw, gm, gp, cell_shift=shift, params_vec=params, dt=0.005, kt_table=kt, xi=0.0, eta=0.0, skin=0.4)
    float(o[6])
    dt_ = (time.perf_counter() - t0) / (reps * k)
    print(f"{tag}: {dt_*1e3:.3f} ms/step  {N/dt_/1e6:.1f} M pss  (compile {t_compile:.1f}s)")

bench("baseline rolled YB=7")
