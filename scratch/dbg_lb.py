import sys; sys.path.insert(0, "/root/repo")
import os
os.environ['JAX_PLATFORMS']='cpu'; os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
os.environ['PALLAS_AXON_POOL_IPS']=''
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

def report(carry, tag_txt):
    pos, vel, frc, tag, ts, cuts = carry
    t = np.asarray(tag); p = np.asarray(pos); c = np.asarray(cuts)
    S, C = 4, N
    sel = t >= 0
    n = sel.sum()
    counts = []
    bad = 0
    for s in range(S):
        rows = slice(s*C, (s+1)*C)
        ts_ = t[rows]; ps_ = p[rows]
        m = ts_ >= 0
        counts.append(int(m.sum()))
        x = ps_[m, 0]
        out = (x < c[s]) | (x >= c[s+1])
        bad += int(out.sum())
    print(f"{tag_txt}: n={n} counts={counts} cuts={np.round(c,2)} mislocated={bad}", flush=True)

report(carry, "init")
for it in range(12):
    carry = rebalance_fn(carry)
    report(carry, f"rebal {it}")
    carry, ths = jax.jit(run_steps, static_argnums=1)(carry, 5)
    ovf = int(np.asarray(ths['overflow']).max())
    nown = int(np.asarray(ths['n_owned'][-1]))
    print(f"  after run: ovf={ovf} n_owned={nown}", flush=True)
    if ovf: break
