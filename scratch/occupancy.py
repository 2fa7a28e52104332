import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import hoomd_tpu as hoomd
from hoomd_tpu import md

hoomd.context.initialize("--notice-level=0")
n = 40; rho = 0.8442
a = (1.0 / rho) ** (1.0 / 3.0)
hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=n)
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

L = np.asarray(system.state.box.L)
cd = (14, 14, 14)
mx = []
for it in range(30):
    system.run(50, quiet=True)
    p = np.asarray(system.state.pos)
    f = (p / L + 0.5) % 1.0
    c = np.floor(f * np.array(cd)).astype(int)
    c = np.minimum(c, np.array(cd) - 1)
    cid = c[:,0] + cd[0]*(c[:,1] + cd[1]*c[:,2])
    cnt = np.bincount(cid, minlength=np.prod(cd))
    mx.append(cnt.max())
mx = np.array(mx)
print("mean occ", N/np.prod(cd))
print("max occupancy per sample:", mx)
print("overall max", mx.max(), "std of counts", cnt.std())
