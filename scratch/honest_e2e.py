"""Honest per-phase profile of the fast engine at 64k: times the
actual run_cycles/run_wins/rebuild jitted programs built by
build_fast_lj_chunk, with forced fetches (axon block_until_ready lies).
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

import hoomd_tpu as hoomd
from hoomd_tpu import md

hoomd.context.initialize('--notice-level=0')
a = (1.0 / 0.8442) ** (1 / 3)
hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=40)
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
system.run(200, quiet=True)

fast = system._program['fast']
fdyn = system._dyn['fast']
carry = system._fast_carry
k = fast['k_rebuild']
print('k_rebuild =', k, ' C =', fast['C'], ' rebin =',
      fast.get('rebin_impl'), flush=True)


def fetch(c):
    return float(jnp.sum(c.vel[0, 0]))


def t(label, fn, n, steps):
    fn()  # warm/compile
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    el = (time.perf_counter() - t0) / n - 0.015
    per = el / max(steps, 1)
    extra = f"  {per*1e3:7.3f} ms/step ({N/per/1e6:6.1f}M pss)" if steps else ""
    print(f"{label:34s}: {el*1e3:8.2f} ms/call{extra}", flush=True)


import functools

run_cycles = fast['run_chunk'].__wrapped__ if hasattr(fast['run_chunk'], '__wrapped__') else None
# use the host orchestrator run(carry, dyn, nsteps, nwin)
run = fast['run_chunk']

NC = 32
for m in (1, 2, 4):
    cad = k * m
    t(f"run {NC*cad} steps cadence {cad}",
      lambda m=m: fetch(run(carry, fdyn, NC * k * m, m)), 3, NC * k * m)

# rebuild alone
reb = fast.get('rebuild')
names = [kk for kk in fast.keys()]
print('program keys:', names, flush=True)
