"""Lattice generators, groups, sorter, snapshot replicate."""

import numpy as np
import pytest


def test_sc_lattice_counts():
    import hoomd_tpu as hoomd
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=2.0), n=5)
    s = hoomd.context.current.system
    assert s.state.N == 125
    assert float(s.state.box.L[0]) == pytest.approx(10.0)


def test_fcc_density():
    import hoomd_tpu as hoomd
    hoomd.init.create_lattice(unitcell=hoomd.lattice.fcc(a=2.0), n=3)
    s = hoomd.context.current.system
    assert s.state.N == 4 * 27
    # no overlapping particles
    snap = s.take_snapshot()
    p = snap.particles.position
    d = np.linalg.norm(p[None] - p[:, None], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() > 1.0


def test_lattice_min_distance_under_pbc():
    """Nearest-neighbor distance across the periodic boundary equals the
    in-box one (replication is seamless)."""
    import hoomd_tpu as hoomd
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.5), n=4)
    s = hoomd.context.current.system
    snap = s.take_snapshot()
    p = snap.particles.position
    L = 6.0
    dr = p[None] - p[:, None]
    dr -= L * np.round(dr / L)
    d = np.linalg.norm(dr, axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() == pytest.approx(1.5, abs=1e-5)


def test_groups():
    import hoomd_tpu as hoomd
    snap = hoomd.data.make_snapshot(
        6, hoomd.data.boxdim(L=10), particle_types=['A', 'B'])
    snap.particles.typeid[:] = [0, 0, 1, 1, 1, 0]
    snap.particles.charge[:] = [0, 1, 0, -1, 0, 0]
    hoomd.init.read_snapshot(snap)
    import hoomd_tpu.group as grp
    ga = grp.all()
    assert len(ga) == 6
    gb = grp.type(type='B')
    assert set(gb.member_tags) == {2, 3, 4}
    gt = grp.tags(1, 3)
    assert set(gt.member_tags) == {1, 2, 3}
    gq = grp.charged()
    assert set(gq.member_tags) == {1, 3}
    gu = grp.union('u', gb, gq)
    assert set(gu.member_tags) == {1, 2, 3, 4}
    gi = grp.intersection('i', gb, gq)
    assert set(gi.member_tags) == {3}
    gd = grp.difference('d', gb, gq)
    assert set(gd.member_tags) == {2, 4}


def test_sorter_preserves_physics():
    """Spatial sorting permutes storage but not the trajectory's physics:
    tags keep identity and energies are unchanged."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.6), n=4)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.langevin(group=hoomd.group.all(), kT=1.0, seed=2)
    hoomd.run(10, quiet=True)
    sys_ = hoomd.context.current.system
    pe_before = sys_.thermo_quantities()['potential_energy']
    # force an explicit sort
    hoomd.context.current.sorter.update(sys_, sys_.timestep)
    sys_._ensure_ready()
    state, nls = sys_._program['prep'](sys_.state, sys_._nl_data,
                                       sys_._dyn)
    sys_.state, sys_._nl_data = state, nls
    pe_after = sys_.thermo_quantities()['potential_energy']
    assert pe_after == pytest.approx(pe_before, rel=1e-5)
    # tag/rtag stay mutually inverse
    tag = np.asarray(sys_.state.tag)
    rtag = np.asarray(sys_.state.rtag)
    np.testing.assert_array_equal(rtag[tag], np.arange(len(tag)))


def test_snapshot_replicate_topology():
    import hoomd_tpu as hoomd
    snap = hoomd.data.make_snapshot(2, hoomd.data.boxdim(L=4),
                                    particle_types=['A'],
                                    bond_types=['b'])
    snap.particles.position[0] = [-0.5, 0, 0]
    snap.particles.position[1] = [0.5, 0, 0]
    snap.bonds.resize(1)
    snap.bonds.group[0] = [0, 1]
    rep = snap.replicate(2, 1, 1)
    assert rep.particles.N == 4
    assert rep.bonds.N == 2
    assert rep.box.Lx == pytest.approx(8.0)
    np.testing.assert_array_equal(rep.bonds.group, [[0, 1], [2, 3]])


def test_box_resize_updater():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=2.0), n=4)
    sys_ = hoomd.context.current.system
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.001)
    md.integrate.nve(group=hoomd.group.all())
    ramp = hoomd.variant.linear_interp([(0, 8.0), (100, 10.0)], zero=0)
    hoomd.update.box_resize(L=ramp, period=10)
    hoomd.run(101, quiet=True)
    assert float(sys_.state.box.L[0]) == pytest.approx(10.0, rel=0.01)
