"""Grand-canonical (muvt) and geometric-cluster (clusters) updaters."""

import numpy as np
import pytest


def test_muvt_ideal_gas_density():
    """Point particles: <N> must equal z*V (ideal-gas grand canonical)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    snap = hoomd.data.make_snapshot(4, hoomd.data.boxdim(L=5))
    rng = np.random.RandomState(0)
    snap.particles.position[:] = rng.uniform(-2.4, 2.4, (4, 3))
    hoomd.init.read_snapshot(snap)
    mc = hpmc.integrate.sphere(seed=2, d=0.0)
    mc.shape_param.set('A', diameter=1e-9)
    mu = hpmc.update.muvt(mc=mc, seed=3, period=1, n_trial=32)
    mu.set_fugacity('A', 0.3)
    system = hoomd.context.current.system
    Ns = []
    for _ in range(35):
        hoomd.run(1, quiet=True)
        Ns.append(system.state.N)
    mean_N = np.mean(Ns[10:])
    # z*V = 0.3 * 125 = 37.5; sigma/sqrt(n_samples) ~ 6/5
    assert mean_N == pytest.approx(37.5, rel=0.2)
    assert mu.n_inserted > 0 and mu.n_removed > 0


def test_muvt_hard_spheres_below_ideal():
    """Excluded volume must push <N> below z*V."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    snap = hoomd.data.make_snapshot(4, hoomd.data.boxdim(L=5))
    rng = np.random.RandomState(1)
    snap.particles.position[:] = rng.uniform(-2.4, 2.4, (4, 3)) \
        * np.array([1, 1, 0.2])
    hoomd.init.read_snapshot(snap)
    mc = hpmc.integrate.sphere(seed=5, d=0.15)
    mc.shape_param.set('A', diameter=1.0)
    mu = hpmc.update.muvt(mc=mc, seed=7, period=1, n_trial=32)
    mu.set_fugacity('A', 0.3)
    system = hoomd.context.current.system
    Ns = []
    for _ in range(30):
        hoomd.run(1, quiet=True)
        Ns.append(system.state.N)
    mean_N = np.mean(Ns[10:])
    assert 2 < mean_N < 33       # well below the ideal-gas 37.5
    # and the configuration stays overlap-free
    snap = system.take_snapshot()
    pos = snap.particles.position
    L = snap.box.Lx
    d = pos[None] - pos[:, None]
    d -= L * np.round(d / L)
    r2 = np.sum(d * d, -1)
    np.fill_diagonal(r2, 1e9)
    assert r2.min() > (1.0 - 1e-6) ** 2


def test_clusters_preserve_hard_sphere_validity():
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.5), n=4)
    mc = hpmc.integrate.sphere(seed=2, d=0.1)
    mc.shape_param.set('A', diameter=1.0)
    cl = hpmc.update.clusters(mc=mc, seed=4, period=1)
    system = hoomd.context.current.system
    p0 = np.asarray(system.take_snapshot().particles.position).copy()
    hoomd.run(20, quiet=True)
    snap = system.take_snapshot()
    pos = snap.particles.position
    assert cl.n_moves >= 20
    assert np.abs(pos - p0).max() > 0.2       # clusters actually moved
    L = snap.box.Lx
    d = pos[None] - pos[:, None]
    d -= L * np.round(d / L)
    r2 = np.sum(d * d, -1)
    np.fill_diagonal(r2, 1e9)
    assert r2.min() > (1.0 - 1e-5) ** 2       # still no overlaps


def test_boxmc_aspect_shear_length():
    """Aspect/shear/length box moves run, deform the box, and never leave
    an overlapping configuration."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.6), n=4)
    mc = hpmc.integrate.sphere(seed=2, d=0.1)
    mc.shape_param.set('A', diameter=1.0)
    bmc = hpmc.update.boxmc(mc=mc, betaP=1.0, seed=9)
    bmc.aspect(delta=0.05, weight=1)
    bmc.shear(delta=0.03, weight=1)
    bmc.length(delta=0.05, weight=1)
    system = hoomd.context.current.system
    L0 = np.asarray(system.state.box.L).copy()
    hoomd.run(40, quiet=True)
    st = system.state
    L1 = np.asarray(st.box.L)
    tilt1 = np.asarray(st.box.tilt)
    assert bmc.accepted > 0
    moved = (np.abs(L1 - L0).max() > 1e-4) or (np.abs(tilt1).max() > 1e-4)
    assert moved
    assert mc.count_overlaps(system) == 0
