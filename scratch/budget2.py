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
fdyn = system._fast_dyn()
print("k_rebuild:", fast['k_rebuild'], "C:", fast['C'], flush=True)

from hoomd_tpu.ops.fast_lj import build_fast_lj_chunk, plan_fast_lj
box = system.state.box
cell_dim, nc, C = plan_fast_lj(N, np.asarray(box.L), 2.5, 0.4)
print("cell_dim:", cell_dim, "nc:", nc, "C:", C, flush=True)

# rebuild internals by re-calling the builder with identical args
import hoomd_tpu.ops.fast_lj as fl
internals = {}
orig_jit = jax.jit
tofast, refresh, run, tostate = build_fast_lj_chunk(
    N=N, box=box, cell_dim=cell_dim, C=C, r_buff=0.4, rcut=2.5,
    method_kind='nvt', method_seed=0, dtype=jnp.float32,
    impl='plane', eval_name=fast['eval_name'], pnames=fast['pnames'],
    ntypes=1, k_rebuild=fast['k_rebuild'])
# reach the closured jitted fns
cells = {c.cell_contents for c in run.__closure__ if hasattr(c, 'cell_contents')}
fns = {getattr(f, '__name__', str(f)): f for f in cells if callable(f)}
print("closure fns:", list(fns.keys()), flush=True)
run_steps = fns.get('run_steps')
run_rebuild = fns.get('run_rebuild')
run_blocks = fns.get('run_blocks')

def t(label, fn, reps=30):
    o = fn(); jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(o)[0])
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:40s} {dt:8.4f} ms", flush=True)
    return dt

m200 = jnp.asarray(200, jnp.int32)
ts = t("run_steps x200 (no rebuild)", lambda: run_steps(carry, fdyn, m200), reps=3) / 200
print(f"  -> {ts:.4f} ms/step (force+integrate only)", flush=True)
tr = t("run_rebuild (sort rebin)", lambda: run_rebuild(carry, fdyn), reps=30)
k = fast['k_rebuild']
print(f"  -> amortized {tr/k:.4f} ms/step at k={k}", flush=True)
tb = t("run_blocks 10x(k steps+rebuild)",
       lambda: run_blocks(carry, fdyn, jnp.asarray(10, jnp.int32), k=k),
       reps=3) / (10*k)
print(f"  -> {tb:.4f} ms/step full cadence", flush=True)

# force kernel alone
from hoomd_tpu.ops.pallas_pair import cell_pair_plane, build_cell_shifts
sh = jnp.asarray(build_cell_shifts(cell_dim, np.asarray(box.L))[1], jnp.float32)
pv = fdyn['pv']
print("pv:", np.asarray(pv), "pnames:", fast['pnames'], flush=True)
pos = carry.pos

for recip in ('approx', 'div'):
    @jax.jit
    def chain(p, n, recip=recip):
        def body(_, p):
            F = cell_pair_plane(p, cell_dim, sh, pv, C=C,
                                pnames=fast['pnames'], recip=recip)
            return p + 1e-12 * F
        return jax.lax.fori_loop(0, n, body, p)
    o = chain(pos, 20); jax.block_until_ready(o)
    t0 = time.perf_counter(); o = chain(pos, 200); jax.block_until_ready(o)
    print(f"cell_pair_plane recip={recip}: "
          f"{(time.perf_counter()-t0)/200*1e3:7.4f} ms", flush=True)
