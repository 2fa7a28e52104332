"""Rigid-body composites (reference ForceComposite.h / md.constrain.rigid;
validation pattern compare_npt_nvt_rigid.py)."""

import numpy as np
import pytest


def dimer_system(n=3, a=3.0):
    """Lattice of central particles; rigid.create_bodies adds 2
    constituents per central along the body x-axis."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.init.create_lattice(
        unitcell=hoomd.lattice.sc(a=a, type_name='R'), n=n)
    system = hoomd.context.current.system
    snap = system.take_snapshot()
    rng = np.random.RandomState(0)
    q = rng.normal(size=(snap.particles.N, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    snap.particles.orientation[:] = q
    snap.particles.moment_inertia[:] = [1.0, 1.0, 1.0]
    snap.particles.velocity[:] = rng.normal(0, 0.3,
                                            (snap.particles.N, 3))
    snap.particles.angmom[:] = rng.normal(0, 0.3, (snap.particles.N, 4))
    snap.particles.angmom[:, 0] = 0
    # constituent type must exist before create_bodies
    if 'A' not in snap.particles.types:
        snap.particles.types.append('A')
    system.restore_snapshot(snap)
    rigid = md.constrain.rigid()
    rigid.set_param('R', types=['A', 'A'],
                    positions=[(-0.5, 0, 0), (0.5, 0, 0)])
    rigid.create_bodies()
    return hoomd, rigid


def test_create_bodies_counts():
    import hoomd_tpu as hoomd
    hoomd_mod, rigid = dimer_system(n=3)
    system = hoomd_mod.context.current.system
    assert system.state.N == 27 * 3     # 27 centrals + 54 constituents
    snap = system.take_snapshot()
    n_const = np.sum((snap.particles.body >= 0)
                     & (snap.particles.body
                        != np.arange(snap.particles.N)))
    assert n_const == 54


def test_rigid_geometry_preserved_under_dynamics():
    """Constituent-central distances stay exactly at the body definition
    through dynamics with pair forces."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    import hoomd_tpu.group as grp
    hoomd_mod, rigid = dimer_system(n=3)
    system = hoomd_mod.context.current.system
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    # constituents interact; centrals are phantom (epsilon 0)
    for (x, y) in [('A', 'A'), ('A', 'R'), ('R', 'R')]:
        lj.pair_coeff.set(x, y, epsilon=0.0, sigma=1.0)
    lj.pair_coeff.set('A', 'A', epsilon=0.5, sigma=0.8)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.langevin(group=grp.rigid_center(), kT=0.5, seed=2)
    hoomd_mod.run(300, quiet=True)
    snap = system.take_snapshot()
    p = snap.particles
    L = snap.box.Lx
    for i in range(p.N):
        if p.body[i] >= 0 and p.body[i] != i:
            dr = p.position[i] - p.position[p.body[i]]
            dr -= L * np.round(dr / L)
            assert np.linalg.norm(dr) == pytest.approx(0.5, abs=1e-4)


def test_rigid_nve_energy_conservation():
    """NVE with rigid dimers: total energy (trans+rot+pot) conserved —
    validates the force/torque reduction against the rotor integrator."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    import hoomd_tpu.group as grp
    hoomd_mod, rigid = dimer_system(n=3, a=2.5)
    system = hoomd_mod.context.current.system
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    for (x, y) in [('A', 'A'), ('A', 'R'), ('R', 'R')]:
        lj.pair_coeff.set(x, y, epsilon=0.0, sigma=1.0)
    lj.pair_coeff.set('A', 'A', epsilon=0.3, sigma=0.8)
    lj.set_params(mode='shift')
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nve(group=grp.rigid_center())
    centers = grp.rigid_center()

    def total_e():
        q = system.thermo_quantities(centers.member_tags)
        pe = system.thermo_quantities()['potential_energy']
        return (q['kinetic_energy'] + q['rotational_kinetic_energy'] + pe)
    hoomd_mod.run(10, quiet=True)
    e0 = total_e()
    hoomd_mod.run(400, quiet=True)
    e1 = total_e()
    n_bodies = len(centers)
    assert abs(e1 - e0) / n_bodies < 2e-3, f"drift {(e1 - e0) / n_bodies}"


def test_intra_body_exclusion():
    """Constituents of the same body must not see each other in the pair
    force (nlist 'body' exclusion, reference md/NeighborList.h)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    import hoomd_tpu.group as grp
    hoomd_mod, rigid = dimer_system(n=2, a=5.0)
    system = hoomd_mod.context.current.system
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    for (x, y) in [('A', 'A'), ('A', 'R'), ('R', 'R')]:
        lj.pair_coeff.set(x, y, epsilon=0.0, sigma=1.0)
    # constituents at distance 1.0 within a body would have huge energy
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.2)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=grp.rigid_center())
    hoomd_mod.run(1, quiet=True)
    pe = system.thermo_quantities()['potential_energy']
    # bodies are ~5 apart: inter-body pairs beyond cutoff; intra-body
    # excluded -> total PE ~ 0
    assert abs(pe) < 1e-3


def test_constrain_sphere():
    """Particles constrained to a sphere stay on it under dynamics
    (reference md.constrain.sphere validation behavior)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    rng = np.random.RandomState(0)
    N = 16
    snap = hoomd.data.make_snapshot(N, hoomd.data.boxdim(L=20),
                                    particle_types=['A'])
    g = rng.normal(size=(N, 3))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    snap.particles.position[:] = g * 3.0
    snap.particles.velocity[:] = rng.normal(0, 0.5, (N, 3))
    hoomd.init.read_snapshot(snap)
    import hoomd_tpu.group as grp
    md.constrain.sphere(group=grp.all(), P=(0, 0, 0), r=3.0)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.langevin(group=grp.all(), kT=1.0, seed=7)
    hoomd.run(300, quiet=True)
    system = hoomd.context.current.system
    p = system.take_snapshot().particles.position
    r = np.linalg.norm(p, axis=1)
    np.testing.assert_allclose(r, 3.0, atol=5e-3)
    # and particles moved around the sphere
    assert np.abs(p - snap.particles.position).max() > 0.5


def test_constrain_oneD():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    import hoomd_tpu.group as grp
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=2.0), n=3)
    system = hoomd.context.current.system
    p0 = system.take_snapshot().particles.position.copy()
    md.constrain.oneD(group=grp.all(), constraint_vector=[0, 0, 1])
    md.integrate.mode_standard(dt=0.005)
    md.integrate.langevin(group=grp.all(), kT=1.0, seed=3)
    hoomd.run(200, quiet=True)
    p1 = system.take_snapshot().particles.position
    # x, y frozen; z moves
    np.testing.assert_allclose(p1[:, :2], p0[:, :2], atol=1e-4)
    assert np.abs(p1[:, 2] - p0[:, 2]).max() > 0.05
