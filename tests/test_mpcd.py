"""MPCD solvent tests (reference mpcd/test/ momentum/thermo checks)."""

import numpy as np
import pytest


def solvated_system(N_solvent=4000, kT=1.0, L=8.0):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, mpcd
    snap = hoomd.data.make_snapshot(8, hoomd.data.boxdim(L=L),
                                    particle_types=['A'])
    rng = np.random.RandomState(0)
    snap.particles.position[:] = (rng.rand(8, 3) - 0.5) * L * 0.8
    snap.particles.velocity[:] = rng.normal(0, np.sqrt(kT), (8, 3))
    hoomd.init.read_snapshot(snap)
    mpcd.init.make_random(N=N_solvent, kT=kT, seed=3)
    return hoomd


def test_srd_momentum_conservation():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, mpcd
    hoomd_mod = solvated_system()
    system = hoomd_mod.context.current.system
    ig = mpcd.integrator(dt=0.01)
    mpcd.stream.bulk(period=1)
    srd = mpcd.collide.srd(seed=7, period=1, angle=130.0)
    srd.embed(hoomd_mod.group.all())
    md.integrate.nve(group=hoomd_mod.group.all())

    def total_p():
        m = system._method_aux_by_obj[system._mpcd_method]
        p_solvent = np.asarray(m['vel']).sum(axis=0)
        snap = system.take_snapshot()
        p_md = (snap.particles.mass[:, None]
                * snap.particles.velocity).sum(axis=0)
        return p_solvent + p_md

    hoomd_mod.run(1, quiet=True)
    p0 = total_p()
    hoomd_mod.run(20, quiet=True)
    p1 = total_p()
    # total momentum conserved through collisions (f32 accumulation)
    assert np.abs(p1 - p0).max() < 0.05


def test_srd_thermostat_temperature():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, mpcd
    hoomd_mod = solvated_system(kT=0.5)
    system = hoomd_mod.context.current.system
    ig = mpcd.integrator(dt=0.01)
    mpcd.stream.bulk(period=1)
    srd = mpcd.collide.srd(seed=7, period=1, angle=130.0, kT=1.0)
    md.integrate.nve(group=hoomd_mod.group.all())
    hoomd_mod.run(100, quiet=True)
    m = system._method_aux_by_obj[system._mpcd_method]
    v = np.asarray(m['vel'])
    T = (v ** 2).sum() / (3 * len(v))
    assert T == pytest.approx(1.0, rel=0.1)


def test_at_collision_temperature():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, mpcd
    hoomd_mod = solvated_system(kT=0.3)
    system = hoomd_mod.context.current.system
    ig = mpcd.integrator(dt=0.01)
    mpcd.stream.bulk(period=1)
    at = mpcd.collide.at(seed=7, period=1, kT=0.8)
    md.integrate.nve(group=hoomd_mod.group.all())
    hoomd_mod.run(50, quiet=True)
    m = system._method_aux_by_obj[system._mpcd_method]
    v = np.asarray(m['vel'])
    T = (v ** 2).sum() / (3 * len(v))
    assert T == pytest.approx(0.8, rel=0.1)


def test_solvent_streams():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, mpcd
    hoomd_mod = solvated_system()
    system = hoomd_mod.context.current.system
    ig = mpcd.integrator(dt=0.01)
    mpcd.stream.bulk(period=1)
    md.integrate.nve(group=hoomd_mod.group.all())
    m0 = None
    hoomd_mod.run(1, quiet=True)
    p0 = np.asarray(system._method_aux_by_obj[
        system._mpcd_method]['pos']).copy()
    hoomd_mod.run(10, quiet=True)
    p1 = np.asarray(system._method_aux_by_obj[
        system._mpcd_method]['pos'])
    assert np.abs(p1 - p0).max() > 1e-3


def test_mpcd_thermo_log_quantities():
    """mpcd_temperature / mpcd_ke are loggable (reference
    CellThermoCompute net quantities)."""
    import numpy as np
    import hoomd_tpu as hoomd
    from hoomd_tpu import mpcd
    hoomd.context.initialize("--notice-level=0")
    snap = hoomd.data.make_snapshot(8, hoomd.data.boxdim(L=10))
    rng = np.random.RandomState(0)
    snap.particles.position[:] = rng.uniform(-4, 4, (8, 3))
    hoomd.init.read_snapshot(snap)
    mpcd.init.make_random(N=2000, kT=1.0, seed=4)
    mpcd.integrator(dt=0.005)
    mpcd.collide.srd(seed=3, period=10, angle=130.0, kT=1.0)
    mpcd.stream.bulk(period=10)
    lg = hoomd.analyze.log(filename=None,
                           quantities=['mpcd_temperature', 'mpcd_ke'],
                           period=10 ** 9)
    hoomd.run(100, quiet=True)
    T = lg.query('mpcd_temperature')
    assert 0.7 < T < 1.3
    assert lg.query('mpcd_ke') > 0


def test_srd_multidevice_parity():
    """MPCD beyond a single chip: solvent arrays shard over the
    'domain' mesh axis (the reference's mpcd::Communicator role
    collapsed into GSPMD collectives, mpcd/Communicator.h); an
    8-device run must reproduce the single-device trajectory."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md, mpcd

    def run_once(args):
        hoomd.context.initialize(args)
        snap = hoomd.data.make_snapshot(
            8, hoomd.data.boxdim(L=8.0), particle_types=['A'])
        rng = np.random.RandomState(0)
        snap.particles.position[:] = (rng.rand(8, 3) - 0.5) * 6.0
        snap.particles.velocity[:] = rng.normal(0, 1.0, (8, 3))
        hoomd.init.read_snapshot(snap)
        mpcd.init.make_random(N=4096, kT=1.0, seed=3)
        system = hoomd.context.current.system
        mpcd.integrator(dt=0.01)
        mpcd.stream.bulk(period=1)
        srd = mpcd.collide.srd(seed=7, period=1, angle=130.0)
        srd.embed(hoomd.group.all())
        md.integrate.nve(group=hoomd.group.all())
        hoomd.run(10, quiet=True)
        aux = system._method_aux_by_obj[system._mpcd_method]
        return (np.asarray(aux['pos']), np.asarray(aux['vel']),
                np.asarray(system.state.pos))

    p8, v8, md8 = run_once('--nrank=8 --notice-level=0')
    p1, v1, md1 = run_once('--notice-level=0')
    np.testing.assert_allclose(p8, p1, atol=1e-4)
    np.testing.assert_allclose(v8, v1, atol=1e-4)
    np.testing.assert_allclose(md8, md1, atol=1e-4)
