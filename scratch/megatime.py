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
k = fast['k_rebuild']
print("k:", k, flush=True)

from hoomd_tpu.ops.fast_lj import build_fast_lj_chunk, plan_fast_lj
box = system.state.box
cell_dim, nc, C = plan_fast_lj(N, np.asarray(box.L), 2.5, 0.4)

import os
outs = {}
for mega in ('on', 'off'):
    os.environ['HOOMD_TPU_MEGA'] = mega
    tofast, refresh, run, tostate = build_fast_lj_chunk(
        N=N, box=box, cell_dim=cell_dim, C=C, r_buff=0.4, rcut=2.5,
        method_kind='nvt', method_seed=0, dtype=jnp.float32,
        impl='plane', eval_name=fast['eval_name'], pnames=fast['pnames'],
        ntypes=1, k_rebuild=k)
    cells = {c.cell_contents for c in run.__closure__
             if hasattr(c, 'cell_contents')}
    fns = {getattr(f, '__name__', str(f)): f for f in cells if callable(f)}
    run_blocks = fns['run_blocks']
    nb = jnp.asarray(20, jnp.int32)
    o = run_blocks(carry, fdyn, jnp.asarray(2, jnp.int32), k=k)
    jax.block_until_ready(o.pos)
    t0 = time.perf_counter()
    o = run_blocks(carry, fdyn, nb, k=k)
    jax.block_until_ready(o.pos)
    dt = (time.perf_counter() - t0) / (20 * k) * 1e3
    print(f"mega={mega}: run_blocks {dt:.4f} ms/step "
          f"(danger={bool(o.danger)}, ovf={bool(o.overflow)})", flush=True)
    outs[mega] = o

# parity: one window from the same carry, compare positions
a = outs['on']; b = outs['off']
m = (a.tag >= 0)
import numpy as _np
pa = _np.asarray(a.pos); pb = _np.asarray(b.pos)
print("pos diff after 20 windows (chaotic, just sanity):",
      float(np.max(np.abs(np.where(m[..., None], pa - pb, 0)))), flush=True)
print("xi on/off:", float(a.aux['xi']), float(b.aux['xi']), flush=True)
print("ke match:", flush=True)
va = _np.asarray(a.vel); vb = _np.asarray(b.vel)
print("  T(on) ", float((va**2).sum() / (3*N)),
      " T(off)", float((vb**2).sum() / (3*N)), flush=True)
