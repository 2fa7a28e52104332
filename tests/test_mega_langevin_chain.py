"""Megastep-kernel Langevin + in-kernel chain-bonded parity.

The megastep Pallas kernel (ops/pallas_pair.py _kernel_megastep) gained
two capabilities this round:
  * a Langevin bath computed IN-KERNEL from the counter hash
    (ops/hashrng.py) — the same stream one_step draws, so fused windows
    and remainder steps are ONE bath (reference md/TwoStepLangevin.cc
    keying discipline);
  * chain-topology bonded forces via in-scan tag matching (FENE /
    harmonic bonds + harmonic angles; reference md/PotentialBondGPU.cuh,
    HarmonicAngleForceComputeGPU.cc) with partner vectors extracted as
    masked lane reductions.

Parity oracle: the one_step path (XLA integrator around the single-step
force kernel, tag-space autodiff bonded terms).  Trajectories of the
two paths share noise bit-for-bit, so short runs must agree to f32
roundoff.  Interpret mode on CPU; compiled Mosaic on TPU.
"""

import os

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _env():
    os.environ['HOOMD_TPU_FAST'] = 'interpret'
    os.environ['HOOMD_TPU_FAST_IMPL'] = 'plane'
    yield
    for e in ('HOOMD_TPU_FAST', 'HOOMD_TPU_FAST_IMPL', 'HOOMD_TPU_MEGA',
              'HOOMD_TPU_CHAIN'):
        os.environ.pop(e, None)


def _lj_system(seed=3):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize('--notice-level=0')
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.3), n=4)
    system = hoomd.context.current.system
    rng = np.random.RandomState(seed)
    snap = system.take_snapshot()
    snap.particles.position[:] += rng.uniform(-0.05, 0.05, (64, 3))
    v = rng.normal(0, 0.5, (64, 3))
    v -= v.mean(0)
    snap.particles.velocity[:] = v
    system.restore_snapshot(snap)
    nl = md.nlist.cell(r_buff=0.4)
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    lj.set_params(mode='shift')
    md.integrate.mode_standard(dt=0.002)
    md.integrate.langevin(group=hoomd.group.all(), kT=1.0, seed=7)
    return hoomd, system


def _kg_system(bond_kind='fene', angles=True):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize('--notice-level=0')
    nch, clen, bond = 4, 8, 0.97
    N = nch * clen
    L = 8.0
    snap = hoomd.data.make_snapshot(
        N, hoomd.data.boxdim(L=L), particle_types=['A'],
        bond_types=['polymer'],
        angle_types=['backbone'] if angles else [])
    rng = np.random.RandomState(5)
    idx = 0
    bonds, angs = [], []
    for c in range(nch):
        x0 = rng.uniform(-3, 3, 3)
        d = rng.normal(0, 1, 3)
        d /= np.linalg.norm(d)
        for m in range(clen):
            p = x0 + m * bond * d + rng.normal(0, 0.03, 3)
            snap.particles.position[idx] = (p + L / 2) % L - L / 2
            if m > 0:
                bonds.append([idx - 1, idx])
            if m > 1:
                angs.append([idx - 2, idx - 1, idx])
            idx += 1
    v = rng.normal(0, 0.5, (N, 3))
    v -= v.mean(0)
    snap.particles.velocity[:] = v
    snap.bonds.resize(len(bonds))
    snap.bonds.group[:] = bonds
    if angles:
        snap.angles.resize(len(angs))
        snap.angles.group[:] = angs
    hoomd.init.read_snapshot(snap)
    system = hoomd.context.current.system
    nl = md.nlist.cell(r_buff=0.4)
    wca = md.pair.lj(r_cut=2 ** (1 / 6), nlist=nl)
    wca.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    wca.set_params(mode='shift')
    if bond_kind == 'fene':
        b = md.bond.fene()
        b.bond_coeff.set('polymer', k=30.0, r0=1.5, sigma=1.0,
                         epsilon=1.0)
    else:
        b = md.bond.harmonic()
        b.bond_coeff.set('polymer', k=100.0, r0=bond)
    if angles:
        a = md.angle.harmonic()
        a.angle_coeff.set('backbone', k=1.5, t0=np.pi)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.langevin(group=hoomd.group.all(), kT=1.0, seed=11)
    return hoomd, system


def test_mega_langevin_engine_parity():
    """Fused-window Langevin == per-step Langevin (same hash bath)."""
    os.environ['HOOMD_TPU_MEGA'] = 'on'
    hoomd, s1 = _lj_system()
    hoomd.run(8, quiet=True)
    assert s1._program['fast']
    p1 = np.asarray(s1.take_snapshot().particles.position)

    os.environ['HOOMD_TPU_MEGA'] = 'off'
    hoomd, s2 = _lj_system()
    hoomd.run(8, quiet=True)
    p2 = np.asarray(s2.take_snapshot().particles.position)
    assert np.abs(p1 - p2).max() < 1e-4


def test_chain_kernel_parity_kg():
    """In-kernel FENE + angles == tag-space autodiff bonded terms."""
    os.environ['HOOMD_TPU_CHAIN'] = 'on'
    hoomd, s1 = _kg_system()
    hoomd.run(8, quiet=True)
    assert s1._program['fast'].get('chain') is not None
    snap1 = s1.take_snapshot()
    q1 = s1.thermo_quantities()

    os.environ['HOOMD_TPU_CHAIN'] = 'off'
    hoomd, s2 = _kg_system()
    hoomd.run(8, quiet=True)
    assert s2._program['fast'].get('chain') is None
    snap2 = s2.take_snapshot()
    q2 = s2.thermo_quantities()
    assert np.abs(np.asarray(snap1.particles.position)
                  - np.asarray(snap2.particles.position)).max() < 1e-4
    assert q1['potential_energy'] == pytest.approx(
        q2['potential_energy'], rel=1e-4, abs=1e-3)


def test_chain_kernel_parity_harmonic_bonds_only():
    os.environ['HOOMD_TPU_CHAIN'] = 'on'
    hoomd, s1 = _kg_system(bond_kind='harmonic', angles=False)
    hoomd.run(8, quiet=True)
    ch = s1._program['fast'].get('chain')
    assert ch is not None and not ch['has_ang']
    p1 = np.asarray(s1.take_snapshot().particles.position)

    os.environ['HOOMD_TPU_CHAIN'] = 'off'
    hoomd, s2 = _kg_system(bond_kind='harmonic', angles=False)
    hoomd.run(8, quiet=True)
    p2 = np.asarray(s2.take_snapshot().particles.position)
    assert np.abs(p1 - p2).max() < 1e-4


def test_chain_detection_rejects_branched():
    """A 3-arm star must NOT take the chain kernel (degree 3)."""
    os.environ['HOOMD_TPU_CHAIN'] = 'on'
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize('--notice-level=0')
    N = 16
    snap = hoomd.data.make_snapshot(
        N, hoomd.data.boxdim(L=12.0), particle_types=['A'],
        bond_types=['b'])
    rng = np.random.RandomState(2)
    snap.particles.position[:] = rng.uniform(-4, 4, (N, 3))
    # star: particle 0 bonded to 1, 2, 3
    snap.bonds.resize(3)
    snap.bonds.group[:] = [[0, 1], [0, 2], [0, 3]]
    hoomd.init.read_snapshot(snap)
    system = hoomd.context.current.system
    nl = md.nlist.cell(r_buff=0.4)
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    b = md.bond.harmonic()
    b.bond_coeff.set('b', k=10.0, r0=1.0)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(2, quiet=True)
    fast = system._program['fast']
    assert fast is None or fast.get('chain') is None
