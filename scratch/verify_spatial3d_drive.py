"""Verify drive: 3-D DD NVE on a 2x2x2 virtual mesh — long enough for
real cross-axis migration; observe energy conservation + ownership."""
import numpy as np
import jax
from jax.sharding import Mesh

devs = jax.devices()
assert len(devs) >= 8, devs
mesh = Mesh(np.array(devs[:8]).reshape(2, 2, 2),
            ('domain_z', 'domain_y', 'domain_x'))

from hoomd_tpu.parallel.spatial3d import build_spatial3d_lj_md

n, spacing = 10, 1.3
L = n * spacing
g = (np.arange(n) + 0.5) * spacing - L / 2
pos = np.stack(np.meshgrid(g, g, g, indexing='ij'), axis=-1).reshape(-1, 3)
rng = np.random.RandomState(7)
vel = rng.normal(0, 0.5, pos.shape)
vel -= vel.mean(axis=0)
N = len(pos)

step_fn, init_fn, run_steps, gather_fn, rebalance_until = \
    build_spatial3d_lj_md(mesh, N, L, dt=0.002, rcut=2.5, r_buff=0.4)
carry = init_fn(pos, vel)
carry, th0 = run_steps(carry, 1)
e0 = float(th0['ke'][-1] + th0['pe'][-1])
carry, th = run_steps(carry, 400)
e1 = float(th['ke'][-1] + th['pe'][-1])
assert int(th['overflow'].max()) == 0, "capacity overflow"
assert int(th['n_owned'][-1]) == N, "ownership lost"
drift = abs(e1 - e0) / N
print(f"N={N} E0={e0:.4f} E400={e1:.4f} drift/N={drift:.2e} "
      f"n_owned={int(th['n_owned'][-1])}")
assert drift < 2e-3, "NVE drift too large"
# migration really happened: particles moved across octants
pg, vg = gather_fn(carry)
moved = np.abs(pg - pos)
moved -= L * np.round(moved / L)
print("max displacement:", float(np.abs(moved).max()))
assert np.abs(moved).max() > spacing, "no real motion"
print("VERIFY OK")
