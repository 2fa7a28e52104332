"""Isolate KG fast-path costs on TPU: WCA-only (no bonds) vs full KG,
same N/box/method.  Usage: python kg_iso_probe.py [wca|kg] [nve|langevin]
"""
import sys
import time

import numpy as np

import hoomd_tpu as hoomd
from hoomd_tpu import md

variant = sys.argv[1] if len(sys.argv) > 1 else 'wca'
method = sys.argv[2] if len(sys.argv) > 2 else 'langevin'

hoomd.context.initialize("--notice-level=0")
n_chains, chain_len, bond = 1024, 32, 0.97
N = n_chains * chain_len
rho = 0.85
Lz = chain_len * bond
area = N / rho / Lz
side = int(np.ceil(np.sqrt(n_chains)))
dxy = np.sqrt(area) / side
box_L = side * dxy
kw = {}
if variant == 'kg':
    kw = dict(bond_types=['polymer'], angle_types=['backbone'])
snap = hoomd.data.make_snapshot(
    N, hoomd.data.boxdim(Lx=box_L, Ly=box_L, Lz=Lz),
    particle_types=['A'], **kw)
idx = 0
bonds, angles = [], []
rng = np.random.RandomState(3)
for c in range(n_chains):
    cx = (c % side + 0.5) * dxy - box_L / 2
    cy = (c // side + 0.5) * dxy - box_L / 2
    z0 = rng.uniform(0, bond)
    for m in range(chain_len):
        z = (z0 + m * bond) % Lz - Lz / 2
        snap.particles.position[idx] = [cx, cy, z]
        if m > 0:
            bonds.append([idx - 1, idx])
        if m > 1:
            angles.append([idx - 2, idx - 1, idx])
        idx += 1
v = rng.normal(0, 1.0, (N, 3))
v -= v.mean(0)
snap.particles.velocity[:] = v
if variant == 'kg':
    snap.bonds.resize(len(bonds)); snap.bonds.group[:] = bonds
    snap.angles.resize(len(angles)); snap.angles.group[:] = angles
hoomd.init.read_snapshot(snap)
system = hoomd.context.current.system
nl = md.nlist.cell()
wca = md.pair.lj(r_cut=2 ** (1 / 6), nlist=nl)
wca.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
wca.set_params(mode='shift')
if variant == 'kg':
    fene = md.bond.fene()
    fene.bond_coeff.set('polymer', k=30.0, r0=1.5, sigma=1.0,
                        epsilon=1.0)
    ang = md.angle.harmonic()
    ang.angle_coeff.set('backbone', k=1.5, t0=np.pi)
md.integrate.mode_standard(dt=0.005)
if method == 'langevin':
    md.integrate.langevin(group=hoomd.group.all(), kT=1.0, seed=17)
else:
    md.integrate.nve(group=hoomd.group.all())
t0 = time.perf_counter()
system.run(10, quiet=True)
print(f"[{variant}/{method}] compile+10: {time.perf_counter()-t0:.1f}s "
      f"fast={bool(system._program.get('fast'))}", flush=True)
system.run(500, quiet=True)
t0 = time.perf_counter()
system.run(2000, quiet=True)
el = time.perf_counter() - t0
print(f"[{variant}/{method}] run(2000): {el:.2f}s = "
      f"{2000 / el * N / 1e6:.1f}M pss", flush=True)
