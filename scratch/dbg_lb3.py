import sys; sys.path.insert(0, "/root/repo")
import os
os.environ['JAX_PLATFORMS']='cpu'; os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
import numpy as np
from jax.sharding import Mesh
from hoomd_tpu.parallel.spatial import build_spatial_lj_md

rng = np.random.RandomState(3)
N, L, rcut = 240, 16.0, 1.5
placed = []
while len(placed) < N:
    x = rng.uniform([-L/2, -L/2, -L/2], [0.0, L/2, L/2])
    if all(np.linalg.norm(((x - p + L/2) % L) - L/2) > 0.85 for p in placed[-60:]):
        placed.append(x)
pos0 = np.asarray(placed)
vel0 = rng.normal(0, 0.3, (N, 3))
mesh4 = Mesh(np.array(jax.devices()[:4]), ('domain',))
step_fn, init_fn, run_steps, gather_fn, rebalance_fn = build_spatial_lj_md(
    mesh4, N, L, dt=0.002, rcut=rcut, r_buff=0.3, slot_cap=N, ghost_cap=N)
carry = init_fn(pos0, vel0)
carry = rebalance_fn(carry)
carry, _ = jax.jit(run_steps, static_argnums=1)(carry, 5)
carry = rebalance_fn(carry)
carry, th = jax.jit(run_steps, static_argnums=1)(carry, 3)
print("pre: ovf", int(np.asarray(th['overflow']).max()))

pos, vel, frc, tag, ts, cuts = carry
p = np.asarray(pos); v = np.asarray(vel); f = np.asarray(frc); t = np.asarray(tag)
c = np.asarray(cuts)
S, C = 4, N
dt = 0.002
for s in range(S):
    rows = slice(s*C, (s+1)*C)
    m = t[rows] >= 0
    ps = p[rows][m]; vs = v[rows][m]; fs = f[rows][m]
    vh = vs + 0.5*dt*fs
    pn = ps + dt*vh
    pn -= L*np.round(pn/L)
    owner = np.sum(pn[:, 0:1] >= c[None, 1:-1], axis=1)
    stay = owner == s
    up = owner == (s+1) % S
    dn = owner == (s-1) % S
    lost = ~(stay | up | dn)
    print(s, "n", m.sum(), "stay", stay.sum(), "up", up.sum(), "dn", dn.sum(), "lost", lost.sum())
    if lost.any():
        print("   lost x:", pn[lost, 0], "owner", owner[lost], "vel", vh[lost, 0], "old x", ps[lost, 0], "|f|", np.abs(fs[lost]).max(axis=1))
