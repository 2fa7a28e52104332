import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np

t00 = time.time()


def log(m):
    print(f'[{time.time()-t00:7.1f}s] {m}', flush=True)


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
log('setup done, N=%d' % N)
system.run(1000, quiet=True)
log('melt done')
lan.disable()
mode.set_params(dt=0.005)
md.integrate.nvt(group=hoomd.group.all(), kT=1.2, tau=0.5)
system.run(500, quiet=True)
log('nvt equil done')
t0 = time.time()
system.run(3000, quiet=True)
el = time.time() - t0
log('run(3000): %.2fs -> %.1fM pss' % (el, N * 3000 / el / 1e6))
q = system.thermo_quantities()
print('T=%.3f pe/N=%.3f' % (q['temperature'], q['potential_energy'] / N),
      'k=', system._program['fast']['k_rebuild'],
      'm=', system._grow.get('fast_m', 1),
      'rebin:', system._program['fast'].get('rebin_impl'), flush=True)
t0 = time.time()
system.run(3000, quiet=True)
el = time.time() - t0
log('second run(3000): %.2fs -> %.1fM pss' % (el, N * 3000 / el / 1e6))
