"""Verify drive: KG polymer melt (FENE + harmonic angles + WCA) via the
public job-script API, langevin thermostat, logger attached."""
import os
os.environ.setdefault('HOOMD_TPU_FAST', 'on')   # exercise the fast engine
import numpy as np

import hoomd_tpu as hoomd
from hoomd_tpu import md

hoomd.context.initialize("--notice-level=0")
n_chains, chain_len, bond = 64, 16, 0.97
N = n_chains * chain_len
rho = 0.85
Lz = chain_len * bond
area = N / rho / Lz
side = int(np.ceil(np.sqrt(n_chains)))
dxy = np.sqrt(area) / side
box_L = side * dxy
snap = hoomd.data.make_snapshot(
    N, hoomd.data.boxdim(Lx=box_L, Ly=box_L, Lz=Lz),
    particle_types=['A'], bond_types=['polymer'], angle_types=['backbone'])
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
snap.bonds.resize(len(bonds)); snap.bonds.group[:] = bonds
snap.angles.resize(len(angles)); snap.angles.group[:] = angles
hoomd.init.read_snapshot(snap)
system = hoomd.context.current.system
nl = md.nlist.cell()
wca = md.pair.lj(r_cut=2 ** (1 / 6), nlist=nl)
wca.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
wca.set_params(mode='shift')
fene = md.bond.fene()
fene.bond_coeff.set('polymer', k=30.0, r0=1.5, sigma=1.0, epsilon=1.0)
ang = md.angle.harmonic()
ang.angle_coeff.set('backbone', k=1.5, t0=np.pi)
md.integrate.mode_standard(dt=0.005)
md.integrate.langevin(group=hoomd.group.all(), kT=1.0, seed=42)
hoomd.analyze.log(filename="/tmp/kg_verify.log",
                  quantities=['potential_energy', 'temperature',
                              'bond_fene_energy', 'angle_harmonic_energy'],
                  period=200, overwrite=True)
hoomd.run(2000, quiet=True)
q = system.thermo_quantities()
print("fast_engine:", bool(system._program.get('fast')))
print("T=%.4f (target 1.0)  PE/N=%.4f" % (q['temperature'],
                                          q['potential_energy'] / N))
rows = open('/tmp/kg_verify.log').read().strip().splitlines()
print("log rows:", len(rows), "| last:", rows[-1])
assert bool(system._program.get('fast')), "KG did not ride the fast engine"
assert 0.85 < q['temperature'] < 1.15, "thermostat failed to hold kT=1"
assert len(rows) == 11, "logger rows wrong (header + 10 samples)"
print("VERIFY OK")
