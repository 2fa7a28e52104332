"""Kremer-Grest polymer melt: FENE bonds + WCA pairs (+ angles) —
BASELINE config 3; reference validation analog (FENE bond stability and
characteristic bond length ~0.97 sigma)."""

import numpy as np
import pytest


def build_melt(n_chains=25, chain_len=10, spacing=1.0):
    """Straight chains, one per x-y column, no periodic wrap mid-chain."""
    import hoomd_tpu as hoomd
    N = n_chains * chain_len
    side = int(np.ceil(np.sqrt(n_chains)))
    box_L = max(side * 1.6, chain_len * spacing + 2.0)
    snap = hoomd.data.make_snapshot(
        N, hoomd.data.boxdim(L=box_L), particle_types=['A'],
        bond_types=['polymer'], angle_types=['backbone'])
    idx = 0
    bonds = []
    angles = []
    for c in range(n_chains):
        cx = (c % side) * 1.6 - box_L / 2 + 0.8
        cy = (c // side) * 1.6 - box_L / 2 + 0.8
        for m in range(chain_len):
            z = (m - (chain_len - 1) / 2) * spacing
            snap.particles.position[idx] = [cx, cy, z]
            if m > 0:
                bonds.append([idx - 1, idx])
            if m > 1:
                angles.append([idx - 2, idx - 1, idx])
            idx += 1
    snap.bonds.resize(len(bonds))
    snap.bonds.group[:] = bonds
    snap.angles.resize(len(angles))
    snap.angles.group[:] = angles
    hoomd.init.read_snapshot(snap)
    return hoomd, N


def test_kg_melt_runs_stable():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd_mod, N = build_melt()
    nl = md.nlist.cell()
    # WCA: LJ cut at 2^(1/6), shifted
    wca = md.pair.lj(r_cut=2 ** (1 / 6), nlist=nl)
    wca.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    wca.set_params(mode='shift')
    fene = md.bond.fene()
    fene.bond_coeff.set('polymer', k=30.0, r0=1.5, sigma=1.0, epsilon=1.0)
    ang = md.angle.harmonic()
    ang.angle_coeff.set('backbone', k=1.5, t0=np.pi)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.langevin(group=hoomd_mod.group.all(), kT=1.0, seed=17)
    hoomd_mod.run(2000, quiet=True)
    system = hoomd_mod.context.current.system
    snap = system.take_snapshot()
    # all bonds intact (FENE max extension 1.5)
    pos = snap.particles.position
    b = snap.bonds.group
    L = snap.box.Lx
    dr = pos[b[:, 1]] - pos[b[:, 0]]
    dr -= L * np.round(dr / L)
    r = np.linalg.norm(dr, axis=1)
    assert r.max() < 1.4, "FENE bond overstretched"
    # KG equilibrium bond length ~0.97 sigma
    assert np.mean(r) == pytest.approx(0.97, abs=0.05)
    q = system.thermo_quantities()
    assert q['temperature'] == pytest.approx(1.0, rel=0.15)
    assert np.isfinite(q['pressure'])


def test_bond_exclusions_applied():
    """Default nlist exclusions remove bonded pairs from the WCA sum:
    pair energy of a dimer at r=0.9 with a bond must be zero."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    snap = hoomd.data.make_snapshot(
        2, hoomd.data.boxdim(L=10), particle_types=['A'],
        bond_types=['b'])
    snap.particles.position[0] = [-0.45, 0, 0]
    snap.particles.position[1] = [0.45, 0, 0]
    snap.bonds.resize(1)
    snap.bonds.group[0] = [0, 1]
    hoomd.init.read_snapshot(snap)
    nl = md.nlist.cell()
    wca = md.pair.lj(r_cut=2 ** (1 / 6), nlist=nl)
    wca.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    h = md.bond.harmonic()
    h.bond_coeff.set('b', k=100.0, r0=0.9)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    system = hoomd.context.current.system
    assert system.force_energy(wca) == pytest.approx(0.0, abs=1e-6)
    assert system.force_energy(h) == pytest.approx(0.0, abs=1e-6)
    # without exclusions the pair energy is nonzero
    nl.reset_exclusions([])
    hoomd.run(1, quiet=True)
    assert system.force_energy(wca) > 1.0


def test_harmonic_bond_analytic():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    snap = hoomd.data.make_snapshot(
        2, hoomd.data.boxdim(L=10), particle_types=['A'],
        bond_types=['b'])
    snap.particles.position[0] = [-0.6, 0, 0]
    snap.particles.position[1] = [0.6, 0, 0]
    snap.bonds.resize(1)
    snap.bonds.group[0] = [0, 1]
    hoomd.init.read_snapshot(snap)
    h = md.bond.harmonic()
    h.bond_coeff.set('b', k=50.0, r0=1.0)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    st = hoomd.context.current.system.state
    f = np.asarray(st.net_force)[np.asarray(st.rtag)]
    # r=1.2, F = -k(r-r0) = -10 along the bond: pulls them together
    assert f[0, 0] == pytest.approx(10.0, rel=1e-4)
    assert f[1, 0] == pytest.approx(-10.0, rel=1e-4)
    pe = float(np.asarray(st.net_pe).sum())
    assert pe == pytest.approx(0.5 * 50 * 0.2 ** 2, rel=1e-4)


def test_angle_analytic():
    """90-degree angle with harmonic k: check torque direction + energy."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    snap = hoomd.data.make_snapshot(
        3, hoomd.data.boxdim(L=10), particle_types=['A'],
        angle_types=['a'])
    snap.particles.position[0] = [1.0, 0, 0]
    snap.particles.position[1] = [0, 0, 0]
    snap.particles.position[2] = [0, 1.0, 0]
    snap.angles.resize(1)
    snap.angles.group[0] = [0, 1, 2]
    hoomd.init.read_snapshot(snap)
    a = md.angle.harmonic()
    a.angle_coeff.set('a', k=10.0, t0=np.pi)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    st = hoomd.context.current.system.state
    pe = float(np.asarray(st.net_pe).sum())
    assert pe == pytest.approx(0.5 * 10 * (np.pi / 2 - np.pi) ** 2,
                               rel=1e-3)
    # forces in tag order (the default sorter may permute storage slots)
    f = np.asarray(st.net_force)[np.asarray(st.rtag)]
    # forces push the angle open toward pi; net force zero
    np.testing.assert_allclose(f.sum(axis=0), 0, atol=1e-4)
    assert f[0, 1] < -1e-3  # end particle pushed to open the angle
    assert f[2, 0] < -1e-3


def test_dihedral_opls_minimum():
    """OPLS dihedral with only k1: minimum at phi=pi."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    snap = hoomd.data.make_snapshot(
        4, hoomd.data.boxdim(L=10), particle_types=['A'],
        dihedral_types=['d'])
    # trans configuration: phi = pi
    snap.particles.position[0] = [0, 1, 0]
    snap.particles.position[1] = [0, 0, 0]
    snap.particles.position[2] = [1, 0, 0]
    snap.particles.position[3] = [1, -1, 0]
    snap.dihedrals.resize(1)
    snap.dihedrals.group[0] = [0, 1, 2, 3]
    hoomd.init.read_snapshot(snap)
    d = md.dihedral.opls()
    d.dihedral_coeff.set('d', k1=2.0, k2=0.0, k3=0.0, k4=0.0)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    st = hoomd.context.current.system.state
    pe = float(np.asarray(st.net_pe).sum())
    # V = k1/2 (1 + cos phi); phi=pi -> 0
    assert pe == pytest.approx(0.0, abs=1e-4)
    f = np.asarray(st.net_force)
    np.testing.assert_allclose(f, 0, atol=1e-3)
