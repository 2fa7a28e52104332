import sys; sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax, jax.numpy as jnp
from hoomd_tpu.ops.pallas_pair import (cell_megastep_plane, cell_pair_plane,
                                       build_cell_shifts)
from hoomd_tpu._config import PAD_COORD

cd = (4, 4, 4)
C = 8
L = 12.0
nc = cd[0] * cd[1] * cd[2]
rng = np.random.RandomState(3)
occ = 5
N = nc * occ
w = L / np.array(cd)
ids = np.arange(nc)
org = np.stack([ids % cd[0] * w[0], ids // cd[0] % cd[1] * w[1],
                ids // (cd[0] * cd[1]) * w[2]], -1) - L / 2
pos = np.full((nc, C, 3), float(PAD_COORD), np.float32)
pos[:, :occ, :] = org[:, None, :] + (0.35 + 0.3 * rng.rand(nc, occ, 3).astype(np.float32)) * w
vel = np.zeros((nc, C, 3), np.float32)
vel[:, :occ, :] = rng.randn(nc, occ, 3).astype(np.float32) * 0.3
mass = np.ones((nc, C), np.float32)

pos = jnp.asarray(pos); vel = jnp.asarray(vel); mass = jnp.asarray(mass)
sh = jnp.asarray(build_cell_shifts(cd, (L,) * 3)[1], jnp.float32)
pv = jnp.asarray([6.25, 0.0, 4.0, 4.0], jnp.float32)  # rc2, e_shift, lj1, lj2
dt = jnp.float32(0.002)
skin = 0.5
k = 3
ndof = 3.0 * N
kT = 1.0
tau = 0.7

def force(p):
    return cell_pair_plane(p, cd, sh, pv, C=C, recip='div', interpret=True)

def ref_run(method):
    p, v = pos, vel
    f = force(p)
    xi = jnp.float32(0.05); eta = jnp.float32(0.0)
    h = 0.5 * dt
    for s_i in range(k):
        if method == 'nvt':
            ke2 = jnp.sum(mass[..., None] * v * v)
            xi1 = xi + h * (ke2 / (ndof * kT) - 1.0) / tau ** 2
            s = jnp.exp(-h * xi1)
            eta = eta + dt * xi1
        else:
            xi1 = xi; s = 1.0
        v = s * v + h * f
        p = p + dt * v
        f2 = force(p)
        # zero PAD forces like the valid-mask does (mega relies on exact-0)
        f = f2
        v = v + h * f
        if method == 'nvt':
            v = v * s
            ke2n = jnp.sum(mass[..., None] * v * v)
            xi = xi1 + h * (ke2n / (ndof * kT) - 1.0) / tau ** 2
    return p, v, f, xi, eta

for method in ('nve', 'nvt'):
    kt = jnp.full((k,), kT, jnp.float32)
    p2, v2, f2, xi2, eta2, danger, ke2 = cell_megastep_plane(
        pos, vel, jnp.asarray(force(pos)), mass, 1.0 / mass, cd, sh, pv,
        dt, kt, jnp.float32(0.05), jnp.float32(0.0), skin, C=C, k=k,
        method=method, recip='div', ndof=ndof,
        tau_inv2=jnp.float32(1.0 / tau ** 2), interpret=True)
    p1, v1, f1, xi1, eta1 = ref_run(method)
    m = jnp.abs(pos[..., 0]) < 1e8  # valid mask
    def err(a, b):
        return float(jnp.max(jnp.abs(jnp.where(m[..., None], a - b, 0.0))))
    print(method, "pos err", err(p1, p2), "vel err", err(v1, v2),
          "frc err", err(f1, f2),
          "xi relerr", float(abs(xi1 - xi2)/(abs(xi1)+1e-12)),
          "eta relerr", float(abs(eta1 - eta2)/(abs(eta1)+1e-12)),
          "danger", bool(danger), flush=True)
