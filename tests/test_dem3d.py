"""3D DEM (vertex-face + edge-edge WCA polyhedra)."""

import numpy as np
import pytest

CUBE = [(-0.5, -0.5, -0.5), (0.5, -0.5, -0.5), (0.5, 0.5, -0.5),
        (-0.5, 0.5, -0.5), (-0.5, -0.5, 0.5), (0.5, -0.5, 0.5),
        (0.5, 0.5, 0.5), (-0.5, 0.5, 0.5)]


def _setup(positions, quats=None, radius=0.2, L=20):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, dem
    hoomd.context.initialize("--notice-level=0")
    N = len(positions)
    snap = hoomd.data.make_snapshot(N, hoomd.data.boxdim(L=L))
    snap.particles.position[:] = positions
    if quats is not None:
        snap.particles.orientation[:] = quats
    snap.particles.moment_inertia[:] = [[0.4, 0.4, 0.4]] * N
    hoomd.init.read_snapshot(snap)
    nl = md.nlist.cell()
    w = dem.pair.WCA(nlist=nl, radius=radius)
    w.setParams('A', vertices=CUBE)
    return hoomd, w


def test_dem3d_basic_forces():
    import hoomd_tpu as hoomd_mod
    # face-to-face cubes, gap 0.42 < 2^(1/6)*0.4 ~ 0.449 -> gentle
    # repulsion (feature contact distance is 2*radius = 0.4)
    hoomd, w = _setup([[0, 0, 0], [1.42, 0, 0]])
    from hoomd_tpu import md
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    system = hoomd.context.current.system
    f = np.asarray(system.state.net_force)[np.asarray(system.state.rtag)]
    E = system.thermo_quantities()['potential_energy']
    assert E > 0
    assert f[0, 0] < -1e-3 and f[1, 0] > 1e-3
    np.testing.assert_allclose(f[0], -f[1], atol=1e-4)
    assert np.isfinite(f).all()

    # far apart: zero
    hoomd, w = _setup([[0, 0, 0], [3.0, 0, 0]])
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    system = hoomd.context.current.system
    E = system.thermo_quantities()['potential_energy']
    assert abs(E) < 1e-9


def test_dem3d_edge_edge():
    """Two cubes rotated 45 deg about z and y meet edge-to-edge: each
    presents an edge at half-diagonal 0.707 toward the other, so at
    separation 1.83 the edge-edge gap is 0.416 < the 0.449 cutoff."""
    from hoomd_tpu import md
    c, s = np.cos(np.pi / 8), np.sin(np.pi / 8)
    qz = [c, 0, 0, s]
    qy = [c, 0, s, 0]
    hoomd, w = _setup([[0, 0, 0], [1.83, 0, 0]], quats=[qz, qy])
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    system = hoomd.context.current.system
    E = system.thermo_quantities()['potential_energy']
    f = np.asarray(system.state.net_force)[np.asarray(system.state.rtag)]
    assert E > 0 and f[1, 0] > 0
    assert np.isfinite(np.asarray(system.state.net_torque)).all()


def test_dem3d_nve_energy_conservation():
    from hoomd_tpu import md
    import hoomd_tpu as hoomd_mod
    rng = np.random.RandomState(0)
    pos = [[0, 0, 0], [1.55, 0.1, -0.05], [0.1, 1.6, 0.1],
           [-1.5, -0.1, 0.2]]
    hoomd, w = _setup(pos)
    snap = hoomd.context.current.system.take_snapshot()
    v = rng.normal(0, 0.15, (4, 3)); v -= v.mean(0)
    snap.particles.velocity[:] = v
    hoomd.context.current.system.restore_snapshot(snap)
    md.integrate.mode_standard(dt=0.001)
    md.integrate.nve(group=hoomd.group.all())
    system = hoomd.context.current.system
    hoomd.run(1, quiet=True)

    def etot():
        q = system.thermo_quantities()
        return (q['kinetic_energy'] + q['potential_energy']
                + q.get('rotational_kinetic_energy', 0.0))
    e0 = etot()
    hoomd.run(400, quiet=True)
    e1 = etot()
    assert abs(e1 - e0) < 2e-3 * max(abs(e0), 1.0)
