"""Profile the fast-engine step components on the real TPU."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

import hoomd_tpu as hoomd
from hoomd_tpu import md

hoomd.context.initialize("--notice-level=0")
n = 40
rho = 0.8442
a = (1.0 / rho) ** (1.0 / 3.0)
hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=n)
system = hoomd.context.current.system
N = system.state.N

rng = np.random.RandomState(1)
snap = system.take_snapshot()
v = rng.normal(0, np.sqrt(1.2), (N, 3))
v -= v.mean(axis=0)
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

# grab the fast carry and program internals
prog = system._program
print("fast:", bool(prog.get('fast')))
fast = prog['fast']
carry = system._fast_carry
dyn = system._fast_dyn()

from hoomd_tpu.ops.pallas_pair import (cell_pair_planar_n3l,
                                       cell_pair_planar,
                                       build_cell_shifts)
from hoomd_tpu.ops.fast_lj import plan_fast_lj

L = np.asarray(system.state.box.L)
cell_dim, nc, C = plan_fast_lj(N, L, 2.5, 0.4)
print("cell_dim", cell_dim, "C", C, "nc", nc)
shifts = jnp.asarray(build_cell_shifts(cell_dim, L)[1], jnp.float32)

pos = carry.pos


def timeit(name, f, *args, reps=50, **kw):
    out = f(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.3f} ms")
    return dt


pv = dyn['pv']
t_n3l = timeit("kernel n3l (force only)", cell_pair_planar_n3l,
               pos.reshape(nc, C, 3), cell_dim, shifts, pv,
               C=C, eval_name='lj', pnames=('lj1', 'lj2', 'rcut'))
t_full = timeit("kernel full planar want_pv=False", cell_pair_planar,
                pos.reshape(nc, C, 3), cell_dim, shifts, pv,
                C=C, eval_name='lj', pnames=('lj1', 'lj2', 'rcut'),
                want_pv=False)

# full step via run_chunk(1)
counters0 = carry
run_chunk = fast['run_chunk']


def one(c):
    return run_chunk(c, dyn, 1)


t_step = timeit("one full step (run_chunk n=1)", one, carry, reps=30)

# 10-step chunk to amortize dispatch
def ten(c):
    return run_chunk(c, dyn, 10)


t10 = timeit("10-step chunk / 10", ten, carry, reps=10)
print(f"per-step in 10-chunk: {t10/10*1e3:.3f} ms")

# rebuild cost: force the rebin by calling to_fast
st = system.state
t_rebin = timeit("to_fast (full rebin)", fast['to_fast'], st,
                 carry.aux, reps=20)
