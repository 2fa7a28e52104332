"""DEM 2D polygons, deprecated module, hdf5 logger."""

import numpy as np
import pytest


def test_dem_squares_repel_and_conserve():
    """Two rounded squares pressed together: repulsion + energy
    conservation under NVE with torques."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, dem
    snap = hoomd.data.make_snapshot(
        2, hoomd.data.boxdim(Lx=20, Ly=20, Lz=1, dimensions=2),
        particle_types=['A'])
    snap.particles.position[0] = [-1.03, 0.05, 0]
    snap.particles.position[1] = [1.03, 0, 0]
    snap.particles.moment_inertia[:] = [0, 0, 1.0]
    hoomd.init.read_snapshot(snap)
    nl = md.nlist.cell()
    w = dem.pair.WCA(nlist=nl, radius=0.5)
    sq = [(-0.5, -0.5), (0.5, -0.5), (0.5, 0.5), (-0.5, 0.5)]
    w.setParams('A', vertices=sq)
    md.integrate.mode_standard(dt=0.0005)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    system = hoomd.context.current.system
    st = system.state
    f = np.asarray(st.net_force)[np.asarray(st.rtag)]
    # faces at x=-0.5 and +0.5 -> feature gap 1.0 < 2^(1/6): repel
    assert f[0, 0] < -0.01
    assert f[1, 0] > 0.01
    np.testing.assert_allclose(f[0], -f[1], atol=1e-4)
    pe0 = system.thermo_quantities()['potential_energy']
    assert pe0 > 0
    q0 = system.thermo_quantities()
    e0 = (q0['kinetic_energy'] + q0['potential_energy']
          + q0['rotational_kinetic_energy'])
    hoomd.run(1000, quiet=True)
    q1 = system.thermo_quantities()
    e1 = (q1['kinetic_energy'] + q1['potential_energy']
          + q1['rotational_kinetic_energy'])
    assert abs(e1 - e0) < 2e-3


def test_dem_utils():
    from hoomd_tpu.dem import utils
    sq = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
    assert utils.area(sq) == pytest.approx(4.0)
    A, c, Iz = utils.mass_properties(sq)
    assert A == pytest.approx(4.0)
    assert c[0] == pytest.approx(0.0, abs=1e-12)


def test_deprecated_xml_roundtrip(tmp_path):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, deprecated
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.5), n=3)
    system = hoomd.context.current.system
    f = str(tmp_path / "cfg")
    deprecated.dump.xml(filename=f, velocity=True)
    pos0 = system.take_snapshot().particles.position.copy()

    hoomd.context.initialize('--notice-level=0')
    deprecated.init.read_xml(f + '.xml')
    pos1 = hoomd.context.current.system.take_snapshot().particles.position
    np.testing.assert_allclose(pos1, pos0, atol=1e-6)


def test_deprecated_msd(tmp_path):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, deprecated
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.5), n=3)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.langevin(group=hoomd.group.all(), kT=1.0, seed=1)
    f = str(tmp_path / "msd.tsv")
    m = deprecated.analyze.msd(filename=f, groups=[hoomd.group.all()],
                               period=50, overwrite=True)
    hoomd.run(200, quiet=True)
    rows = open(f).read().strip().split('\n')
    assert len(rows) >= 3
    vals = [float(r.split('\t')[1]) for r in rows[1:]]
    assert vals[-1] > vals[0]          # diffusing


def test_random_polymers():
    import hoomd_tpu as hoomd
    from hoomd_tpu import deprecated
    box = hoomd.data.boxdim(L=15)
    deprecated.init.create_random_polymers(
        box=box, polymers=[dict(bond_len=1.0, type=['A'] * 5,
                                count=10)],
        separation=dict(A=0.35), seed=4)
    system = hoomd.context.current.system
    assert system.state.N == 50
    assert system.snapshot_template.bonds.N == 40


def test_hdf5_logger(tmp_path):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, hdf5
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.5), n=3)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.nve(group=hoomd.group.all())
    f = str(tmp_path / "log.npz")
    with hdf5.File(f, 'a') as h5:
        lg = hdf5.log(h5, quantities=['potential_energy', 'temperature'],
                      period=20)
        hoomd.run(60, quiet=True)
    data = np.load(f)
    assert len(data['timestep']) == 3
    assert np.isfinite(data['potential_energy']).all()


def test_external_field_dipole():
    """md.force.dipole: torque = p (m x E) exactly at fixed orientation;
    rotational NVE conserves KE_rot + U = -m.E."""
    import numpy as np
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize("--notice-level=0")
    snap = hoomd.data.make_snapshot(4, hoomd.data.boxdim(L=10))
    rng = np.random.RandomState(0)
    snap.particles.position[:] = rng.uniform(-3, 3, (4, 3))
    q = rng.normal(size=(4, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    snap.particles.orientation[:] = q
    snap.particles.moment_inertia[:] = [[0.5, 0.5, 0.5]] * 4
    snap.particles.angmom[:] = rng.normal(0, 0.3, (4, 4))
    snap.particles.angmom[:, 0] = 0
    hoomd.init.read_snapshot(snap)
    md.force.dipole(field_x=0.3, field_y=-0.2, field_z=0.8, p=1.5)
    md.integrate.mode_standard(dt=0.0, aniso=True)
    md.integrate.nve(group=hoomd.group.all())
    system = hoomd.context.current.system
    hoomd.run(1, quiet=True)
    st = system.state
    o = np.asarray(st.rtag)
    tq = np.asarray(st.net_torque)[o]

    def rot_np(qq, v):
        w = qq[0]
        u = np.asarray(qq[1:])
        t = 2 * np.cross(u, v)
        return v + w * t + np.cross(u, t)
    E = np.array([0.3, -0.2, 0.8])
    for i in range(4):
        m = 1.5 * rot_np(q[i], np.array([0, 0, 1.0]))
        np.testing.assert_allclose(tq[i], np.cross(m, E), atol=1e-5)
    system.integrator_mode.set_params(dt=0.001)
    hoomd.run(1, quiet=True)

    def etot():
        qd = system.thermo_quantities()
        return (qd['kinetic_energy'] + qd['potential_energy']
                + qd.get('rotational_kinetic_energy', 0.0))
    e0 = etot()
    hoomd.run(1500, quiet=True)
    assert abs(etot() - e0) < 1e-3
