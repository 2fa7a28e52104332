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

def hops(carry):
    pos, vel, frc, tag, ts, cuts = carry
    t = np.asarray(tag); p = np.asarray(pos); c = np.asarray(cuts)
    S, C = 4, N
    worst = 0; det = []
    for s in range(S):
        rows = slice(s*C, (s+1)*C)
        m = t[rows] >= 0
        x = p[rows][m, 0]
        owner = np.sum(x[:, None] >= c[None, 1:-1], axis=1)
        hop = np.minimum((owner - s) % S, (s - owner) % S)
        if len(hop) and hop.max() > worst:
            worst = hop.max()
        for xx, ow, hp in zip(x, owner, hop):
            if hp > 1:
                det.append((s, float(xx), int(ow)))
    return worst, det

carry = rebalance_fn(carry)
carry, _ = jax.jit(run_steps, static_argnums=1)(carry, 5)
carry = rebalance_fn(carry)
w, det = hops(carry)
print("after rebal1: worst hop", w, det[:5], flush=True)
cuts = np.asarray(carry[5]); print("cuts", np.round(cuts, 3))
for k in range(5):
    carry, th = jax.jit(run_steps, static_argnums=1)(carry, 1)
    w, det = hops(carry)
    print(f"step {k}: ovf={int(np.asarray(th['overflow']).max())} n={int(np.asarray(th['n_owned'])[-1])} worst_hop={w} {det[:4]}", flush=True)
