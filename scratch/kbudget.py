"""Budget: time each piece of the fast-engine step at the bench config.

- cell_pair_plane force kernel alone (want_pv=False path, approx recip)
- one_step via run_steps with dt ~ 0 (no rebuild ever)
- rebuild alone (run_rebuild)
- full cadence (run via system.run)
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
import hoomd_tpu as hoomd
from hoomd_tpu import md

hoomd.context.initialize("--notice-level=0")
a = (1.0 / 0.8442) ** (1.0/3.0)
hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=40)
system = hoomd.context.current.system
N = system.state.N
rng = np.random.RandomState(1)
snap = system.take_snapshot()
v = rng.normal(0, np.sqrt(1.2), (N, 3)); v -= v.mean(axis=0)
snap.particles.velocity[:] = v
system.restore_snapshot(snap)
nl = md.nlist.cell(r_buff=0.4)
lj = md.pair.lj(r_cut=2.5, nlist=nl)
lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
lj.set_params(mode='shift')
mode = md.integrate.mode_standard(dt=0.001)
lan = md.integrate.langevin(group=hoomd.group.all(), kT=1.2, seed=7)
system.run(1000, quiet=True)
lan.disable()
mode.set_params(dt=0.005)
md.integrate.nvt(group=hoomd.group.all(), kT=1.2, tau=0.5)
system.run(500, quiet=True)

fast = system._program['fast']
carry = system._fast_carry
fdyn = dict(system._dyn['fast'])
print("carry pos shape:", carry.pos.shape, flush=True)
nc, C, _ = carry.pos.shape

# figure out cell_dim from system program meta if available
meta = fast.get('meta', {})
print("meta:", {k: v for k, v in meta.items() if not callable(v)}, flush=True)

from hoomd_tpu.ops.pallas_pair import cell_pair_plane, build_cell_shifts

# recover cell_dim: find dims whose product is nc (12,14,14 expected)
cell_dim = meta.get('cell_dim', (12, 14, 14))
print("cell_dim:", cell_dim, "C:", C, flush=True)
L = float(system.state.box.L[0])
sh = jnp.asarray(build_cell_shifts(cell_dim, (L,)*3)[1], jnp.float32)
pv = fdyn['pv']
print("pv:", pv, flush=True)

pos = carry.pos

def timeit(label, fn, *args, reps=100, **kw):
    o = fn(*args, **kw); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args, **kw)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:42s} {dt:8.4f} ms", flush=True)
    return dt

# force kernel alone (chained to avoid dispatch dominating)
@jax.jit
def chain_force(p, n):
    def body(_, p):
        F = cell_pair_plane(p, cell_dim, sh, pv, C=C, recip='approx')
        return p + 1e-12 * F
    return jax.lax.fori_loop(0, n, body, p)

o = chain_force(pos, 50); jax.block_until_ready(o)
t0 = time.perf_counter(); o = chain_force(pos, 200); jax.block_until_ready(o)
print(f"{'cell_pair_plane (chained x200)':42s} {(time.perf_counter()-t0)/200*1e3:8.4f} ms", flush=True)

# single dispatch
timeit("cell_pair_plane (single dispatch)",
       lambda: cell_pair_plane(pos, cell_dim, sh, pv, C=C, recip='approx'),
       reps=50)

# full step loop without rebuilds
rs = fast['run_steps'] if 'run_steps' in fast else None
print("fast keys:", list(fast.keys()), flush=True)
