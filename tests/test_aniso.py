"""Anisotropic pair potentials + rotational integration
(reference md/test/test_gayberne.cc analytic checks; aniso NVE energy
conservation is the decisive force/torque/integrator consistency test)."""

import numpy as np
import pytest


def two_ellipsoids(q1=None, q2=None, r=2.0, L=20.0):
    import hoomd_tpu as hoomd
    snap = hoomd.data.make_snapshot(2, hoomd.data.boxdim(L=L),
                                    particle_types=['A'])
    snap.particles.position[0] = [-r / 2, 0, 0]
    snap.particles.position[1] = [r / 2, 0, 0]
    if q1 is not None:
        snap.particles.orientation[0] = q1
    if q2 is not None:
        snap.particles.orientation[1] = q2
    snap.particles.moment_inertia[:] = [1.0, 1.0, 1.0]
    hoomd.init.read_snapshot(snap)
    return hoomd


def test_gb_reduces_to_lj_for_spheres():
    """lperp == lpar: Gay-Berne must reduce to shifted LJ with
    sigma = 2*lperp (the contact distance is orientation-independent)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    r = 1.3
    hoomd_mod = two_ellipsoids(r=r)
    nl = md.nlist.cell()
    g = md.pair.gb(r_cut=3.0, nlist=nl)
    g.pair_coeff.set('A', 'A', epsilon=1.0, lperp=0.5, lpar=0.5)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd_mod.group.all())
    hoomd_mod.run(1, quiet=True)
    system = hoomd_mod.context.current.system
    pe = system.thermo_quantities()['potential_energy']
    # sigma = sigma_min = 1.0; zeta = r; V = 4(z^-12 - z^-6) shifted at rc
    z = r

    def v(z):
        return 4 * (z ** -12 - z ** -6)
    assert pe == pytest.approx(v(r) - v(3.0), rel=1e-3)


def test_gb_orientation_dependence():
    """Side-by-side prolate ellipsoids repel at r where end-to-end don't."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md

    def energy_at(q1, q2):
        hoomd.context.initialize('--notice-level=0')
        hoomd_mod = two_ellipsoids(q1=q1, q2=q2, r=2.2)
        nl = md.nlist.cell()
        g = md.pair.gb(r_cut=5.0, nlist=nl)
        g.pair_coeff.set('A', 'A', epsilon=1.0, lperp=0.5, lpar=1.5)
        md.integrate.mode_standard(dt=0.0)
        md.integrate.nve(group=hoomd_mod.group.all())
        hoomd_mod.run(1, quiet=True)
        return hoomd_mod.context.current.system.thermo_quantities()[
            'potential_energy']

    # z-axis (symmetry axis) along z: separation along x => side-by-side
    e_side = energy_at([1, 0, 0, 0], [1, 0, 0, 0])
    # rotate both by 90 deg about y: symmetry axis along x => end-to-end
    s = np.sin(np.pi / 4)
    c = np.cos(np.pi / 4)
    e_end = energy_at([c, 0, s, 0], [c, 0, s, 0])
    # side-by-side at r=2.2 with sigma_side=1.0: far out in the tail;
    # end-to-end with sigma_end=3.0: strongly repulsive
    assert e_end > 1.0
    assert abs(e_side) < 0.2
    assert e_end > e_side + 1.0


def test_gb_nve_energy_conservation_with_rotation():
    """The decisive consistency test: forces+torques from autodiff and the
    NO_SQUISH rotor must conserve total (trans+rot+pot) energy."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    rng = np.random.RandomState(4)
    n = 4
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=2.2), n=n)
    system = hoomd.context.current.system
    snap = system.take_snapshot()
    N = snap.particles.N
    snap.particles.velocity[:] = rng.normal(0, 0.4, (N, 3))
    snap.particles.moment_inertia[:] = [1.0, 1.0, 0.5]
    # random initial orientations
    q = rng.normal(size=(N, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    snap.particles.orientation[:] = q
    # random angular momenta
    snap.particles.angmom[:] = rng.normal(0, 0.4, (N, 4))
    snap.particles.angmom[:, 0] = 0.0
    system.restore_snapshot(snap)
    nl = md.nlist.cell()
    g = md.pair.gb(r_cut=4.0, nlist=nl)
    g.pair_coeff.set('A', 'A', epsilon=0.5, lperp=0.4, lpar=0.9)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(10, quiet=True)

    def total_e():
        q = system.thermo_quantities()
        return (q['kinetic_energy'] + q['potential_energy']
                + q['rotational_kinetic_energy'])
    e0 = total_e()
    hoomd.run(400, quiet=True)
    e1 = total_e()
    assert abs(e1 - e0) / N < 1e-3, f"aniso drift {(e1 - e0) / N}"
    # rotational KE must actually be nonzero (rotors are live)
    assert system.thermo_quantities()['rotational_kinetic_energy'] > 0.01


def test_dipole_analytic():
    """Two aligned dipoles head-to-tail: U = -2 A mu^2/r^3 (kappa=0)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    r = 2.0
    hoomd_mod = two_ellipsoids(r=r)   # dipoles along x (body x-axis)
    nl = md.nlist.cell()
    d = md.pair.dipole(r_cut=6.0, nlist=nl)
    d.pair_coeff.set('A', 'A', mu=1.5, A=1.0, kappa=0.0)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd_mod.group.all())
    hoomd_mod.run(1, quiet=True)
    system = hoomd_mod.context.current.system
    pe = system.thermo_quantities()['potential_energy']
    mu = 1.5
    assert pe == pytest.approx(-2 * mu * mu / r ** 3, rel=1e-3)
    # force: attractive along x, F = -6 mu^2/r^4
    st = system.state
    f = np.asarray(st.net_force)[np.asarray(st.rtag)]
    assert f[0, 0] == pytest.approx(6 * mu * mu / r ** 4, rel=1e-3)


def test_dipole_torque_perpendicular():
    """Perpendicular dipoles feel equal-magnitude torques; energy matches
    the point-dipole formula."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    r = 2.0
    s = np.sin(np.pi / 4)
    c = np.cos(np.pi / 4)
    # particle 1 rotated 90deg about z: dipole along y
    hoomd_mod = two_ellipsoids(q2=[c, 0, 0, s], r=r)
    nl = md.nlist.cell()
    d = md.pair.dipole(r_cut=6.0, nlist=nl)
    d.pair_coeff.set('A', 'A', mu=1.0, A=1.0, kappa=0.0)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd_mod.group.all())
    hoomd_mod.run(1, quiet=True)
    system = hoomd_mod.context.current.system
    pe = system.thermo_quantities()['potential_energy']
    # p1 along x, p2 along y, r along x: U = (p1.p2)/r^3 - 3(p1.r)(p2.r)/r^5
    assert pe == pytest.approx(0.0, abs=1e-4)
    st = system.state
    tq = np.asarray(st.net_torque)[np.asarray(st.rtag)]
    # torque on dipole 2 about z from dipole 1's field: B field of p1 at
    # position along +x is along +x (2 p/r^3); torque = p2 x E
    assert abs(tq[1, 2]) > 1e-3
    # no net torque about x on particle 1 beyond symmetry
    assert np.isfinite(tq).all()
