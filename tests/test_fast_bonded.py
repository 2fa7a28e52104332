"""Fast-engine bonded forces (VERDICT item 4b): FENE/harmonic bonds,
angles and nlist-exclusion corrections ride the cell-major engine as
tag-space terms.  Parity oracle: the general engine on the same
trajectory.  (HOOMD_TPU_FAST=on routes the fast path on any backend
with the XLA impl — tests/conftest.py runs CPU.)"""

import os

import numpy as np
import pytest


def _build_kg(seed=9, n_chains=16, chain_len=16):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    N = n_chains * chain_len
    side = int(np.ceil(np.sqrt(n_chains)))
    box_L = max(side * 1.6, chain_len * 0.97 + 2.0)
    snap = hoomd.data.make_snapshot(
        N, hoomd.data.boxdim(L=box_L), particle_types=['A'],
        bond_types=['polymer'], angle_types=['backbone'])
    idx = 0
    bonds, angles = [], []
    for c in range(n_chains):
        cx = (c % side) * 1.6 - box_L / 2 + 0.8
        cy = (c // side) * 1.6 - box_L / 2 + 0.8
        for m in range(chain_len):
            z = (m - (chain_len - 1) / 2) * 0.97
            snap.particles.position[idx] = [cx, cy, z]
            if m > 0:
                bonds.append([idx - 1, idx])
            if m > 1:
                angles.append([idx - 2, idx - 1, idx])
            idx += 1
    rng = np.random.RandomState(seed)
    v = rng.normal(0, 0.6, (N, 3))
    v -= v.mean(axis=0)
    snap.particles.velocity[:] = v
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
    return hoomd, system


def _run_kg(fast, steps=30, method='nve'):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    os.environ['HOOMD_TPU_FAST'] = 'on' if fast else 'off'
    try:
        hoomd.context.initialize('--notice-level=0')
        hoomd_mod, system = _build_kg()
        md.integrate.mode_standard(dt=0.002)
        if method == 'nve':
            md.integrate.nve(group=hoomd.group.all())
        else:
            md.integrate.nvt(group=hoomd.group.all(), kT=1.0, tau=0.5)
        hoomd.run(steps, quiet=True)
        q = system.thermo_quantities()
        snap = system.take_snapshot()
        used_fast = bool(system._program.get('fast'))
        return snap.particles.position.copy(), q, used_fast
    finally:
        os.environ.pop('HOOMD_TPU_FAST', None)


def test_fast_bonded_matches_general_engine_nve():
    pos_g, q_g, f_g = _run_kg(fast=False)
    pos_f, q_f, f_f = _run_kg(fast=True)
    assert not f_g and f_f, (f_g, f_f)
    # load-bearing: bonds stretched from 0.97 start => strong FENE energy
    assert abs(q_g['potential_energy']) > 1.0
    assert q_f['potential_energy'] == pytest.approx(
        q_g['potential_energy'], rel=2e-4)
    assert q_f['pressure'] == pytest.approx(q_g['pressure'], rel=2e-3,
                                            abs=1e-4)
    np.testing.assert_allclose(pos_f, pos_g, atol=5e-4)


def test_fast_bonded_matches_general_engine_nvt():
    pos_g, q_g, _ = _run_kg(fast=False, method='nvt')
    pos_f, q_f, f_f = _run_kg(fast=True, method='nvt')
    assert f_f
    assert q_f['potential_energy'] == pytest.approx(
        q_g['potential_energy'], rel=2e-4)
    np.testing.assert_allclose(pos_f, pos_g, atol=5e-4)


def test_fast_exclusions_zero_wca_on_bonded_dimer():
    """A bonded dimer at r=0.9 < 2^(1/6): default 'bond' exclusions must
    remove the pair term, leaving exactly the FENE energy — a sign error
    in the exclusion correction doubles or cancels it."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    os.environ['HOOMD_TPU_FAST'] = 'on'
    try:
        hoomd.context.initialize('--notice-level=0')
        r0 = 0.9
        snap = hoomd.data.make_snapshot(
            2, hoomd.data.boxdim(L=12), particle_types=['A'],
            bond_types=['b'])
        snap.particles.position[0] = [-r0 / 2, 0, 0]
        snap.particles.position[1] = [r0 / 2, 0, 0]
        snap.bonds.resize(1)
        snap.bonds.group[0] = [0, 1]
        hoomd.init.read_snapshot(snap)
        system = hoomd.context.current.system
        nl = md.nlist.cell()
        wca = md.pair.lj(r_cut=2 ** (1 / 6), nlist=nl)
        wca.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
        wca.set_params(mode='shift')
        h = md.bond.harmonic()
        h.bond_coeff.set('b', k=100.0, r0=1.0)
        md.integrate.mode_standard(dt=0.0)
        md.integrate.nve(group=hoomd.group.all())
        hoomd.run(1, quiet=True)
        assert bool(system._program.get('fast'))
        pe = system.thermo_quantities()['potential_energy']
        e_harm = 0.5 * 100.0 * (r0 - 1.0) ** 2
        assert pe == pytest.approx(e_harm, rel=1e-4)
    finally:
        os.environ.pop('HOOMD_TPU_FAST', None)


def test_fast_bonded_energy_conservation_nve():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    os.environ['HOOMD_TPU_FAST'] = 'on'
    try:
        hoomd.context.initialize('--notice-level=0')
        hoomd_mod, system = _build_kg(seed=3)
        md.integrate.mode_standard(dt=0.002)
        md.integrate.nve(group=hoomd.group.all())
        hoomd.run(50, quiet=True)     # settle
        q0 = system.thermo_quantities()
        e0 = q0['potential_energy'] + q0['kinetic_energy']
        hoomd.run(500, quiet=True)
        q1 = system.thermo_quantities()
        e1 = q1['potential_energy'] + q1['kinetic_energy']
        N = system.state.N
        assert abs(e1 - e0) / N < 2e-3, (e0, e1)
    finally:
        os.environ.pop('HOOMD_TPU_FAST', None)


def test_fslj_excl_correction_has_rcut():
    """needs_rcut evaluators (force_shifted_lj) through the fast path's
    exclusion-pair correction: the per-pair param gather must include
    'rcut' (regression: KeyError on the first refresh)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md

    def build(fast):
        os.environ['HOOMD_TPU_FAST'] = 'on' if fast else 'off'
        hoomd.context.initialize('--notice-level=0')
        N = 32
        L = 16.0
        snap = hoomd.data.make_snapshot(
            N, hoomd.data.boxdim(L=L), particle_types=['A'],
            bond_types=['b'])
        rng = np.random.RandomState(4)
        # dimers: bonded pairs at 1.1 sigma, well inside r_cut
        bonds = []
        for i in range(0, N, 2):
            base = rng.uniform(-L / 2 + 2, L / 2 - 2, 3)
            snap.particles.position[i] = base
            snap.particles.position[i + 1] = base + [1.1, 0, 0]
            bonds.append([i, i + 1])
        snap.bonds.resize(len(bonds))
        snap.bonds.group[:] = bonds
        v = rng.normal(0, 0.3, (N, 3)); v -= v.mean(0)
        snap.particles.velocity[:] = v
        hoomd.init.read_snapshot(snap)
        system = hoomd.context.current.system
        nl = md.nlist.cell()
        p = md.pair.force_shifted_lj(r_cut=2.5, nlist=nl)
        p.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
        b = md.bond.harmonic()
        b.bond_coeff.set('b', k=50.0, r0=1.1)
        md.integrate.mode_standard(dt=0.002)
        md.integrate.nve(group=hoomd.group.all())
        hoomd.run(20, quiet=True)
        q = system.thermo_quantities()
        return q['potential_energy'], bool(system._program.get('fast'))
    try:
        pe_fast, used_fast = build(True)
        pe_gen, _ = build(False)
    finally:
        os.environ.pop('HOOMD_TPU_FAST', None)
    assert used_fast
    assert pe_fast == pytest.approx(pe_gen, rel=1e-4, abs=1e-4)
