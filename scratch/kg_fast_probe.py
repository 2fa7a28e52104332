import time
import numpy as np
import hoomd_tpu as hoomd
from hoomd_tpu import md

t00 = time.perf_counter()
hoomd.context.initialize("--notice-level=0")
n_chains, chain_len, bond = 1024, 32, 0.97
N = n_chains * chain_len
rho = 0.85
Lz = chain_len * bond
area = N / rho / Lz
side = int(np.ceil(np.sqrt(n_chains)))
dxy = np.sqrt(area) / side
box_L = side * dxy
snap = hoomd.data.make_snapshot(N, hoomd.data.boxdim(Lx=box_L, Ly=box_L, Lz=Lz),
                                particle_types=['A'], bond_types=['polymer'],
                                angle_types=['backbone'])
idx = 0; bonds=[]; angles=[]
rng = np.random.RandomState(3)
for c in range(n_chains):
    cx = (c % side + 0.5) * dxy - box_L / 2
    cy = (c // side + 0.5) * dxy - box_L / 2
    z0 = rng.uniform(0, bond)
    for m in range(chain_len):
        z = (z0 + m * bond) % Lz - Lz / 2
        snap.particles.position[idx] = [cx, cy, z]
        if m > 0: bonds.append([idx-1, idx])
        if m > 1: angles.append([idx-2, idx-1, idx])
        idx += 1
v = rng.normal(0, 1.0, (N,3)); v -= v.mean(0)
snap.particles.velocity[:] = v
snap.bonds.resize(len(bonds)); snap.bonds.group[:] = bonds
snap.angles.resize(len(angles)); snap.angles.group[:] = angles
hoomd.init.read_snapshot(snap)
system = hoomd.context.current.system
nl = md.nlist.cell()
wca = md.pair.lj(r_cut=2**(1/6), nlist=nl)
wca.pair_coeff.set('A','A', epsilon=1.0, sigma=1.0)
wca.set_params(mode='shift')
fene = md.bond.fene()
fene.bond_coeff.set('polymer', k=30.0, r0=1.5, sigma=1.0, epsilon=1.0)
ang = md.angle.harmonic()
ang.angle_coeff.set('backbone', k=1.5, t0=np.pi)
md.integrate.mode_standard(dt=0.005)
md.integrate.langevin(group=hoomd.group.all(), kT=1.0, seed=17)
print(f"setup {time.perf_counter()-t00:.1f}s", flush=True)
t0 = time.perf_counter()
system.run(10, quiet=True)
print(f"first run(10) incl compile: {time.perf_counter()-t0:.1f}s fast={bool(system._program.get('fast'))}", flush=True)
t0 = time.perf_counter()
system.run(200, quiet=True)
el = time.perf_counter()-t0
print(f"run(200): {el:.2f}s = {200/el*N/1e6:.1f}M pss", flush=True)
t0 = time.perf_counter()
system.run(1000, quiet=True)
el = time.perf_counter()-t0
print(f"run(1000): {el:.2f}s = {1000/el*N/1e6:.1f}M pss", flush=True)
