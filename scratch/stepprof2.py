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
rc = fast['run_chunk']

def timechunk(label, fdyn, n=200):
    o = rc(carry, fdyn, jnp.asarray(50, jnp.int32)); jax.block_until_ready(o.pos)
    t0 = time.perf_counter(); o = rc(carry, fdyn, jnp.asarray(n, jnp.int32)); jax.block_until_ready(o.pos)
    dt = (time.perf_counter()-t0)/n*1e3
    print(f"{label:28s} {dt:.3f} ms/step rebuilds={int(o.n_rebuilds)-int(carry.n_rebuilds)}", flush=True)

fdyn = dict(system._dyn['fast'])
timechunk("dt=0.005 (normal)", fdyn)
f2 = dict(fdyn); f2['dt'] = jnp.asarray(1e-7, jnp.float32)
timechunk("dt~0 (no rebuild)", f2)
