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


def test_muvt_gibbs_density_equilibration():
    """Gibbs ensemble (ngibbs=2): dilute hard spheres transfer between
    equal-volume boxes until the densities equalize; total N conserved
    and both boxes stay overlap-free."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    rng = np.random.RandomState(4)
    N0 = 48
    snap = hoomd.data.make_snapshot(N0, hoomd.data.boxdim(L=10))
    # dilute random non-overlapping placement (diameter 1)
    placed = []
    while len(placed) < N0:
        x = rng.uniform(-4.9, 4.9, 3)
        if all(np.linalg.norm(((x - p + 5) % 10) - 5) > 1.01
               for p in placed):
            placed.append(x)
    snap.particles.position[:] = placed
    hoomd.init.read_snapshot(snap)
    mc = hpmc.integrate.sphere(seed=5, d=0.3)
    mc.shape_param.set('A', diameter=1.0)
    # partner replicates the snapshot, then transfers drain the
    # imbalance: start 48 vs 48 is already balanced, so delete from the
    # partner to create an imbalance
    mu = hpmc.update.muvt(mc=mc, seed=6, period=4, ngibbs=2, n_trial=8)
    psys = mu.gibbs_partner_system()
    psnap = psys.take_snapshot()
    keep = np.arange(12)
    small = hoomd.data.make_snapshot(
        len(keep), hoomd.data.boxdim(L=10), particle_types=['A'])
    small.particles.position[:] = \
        np.asarray(psnap.particles.position)[keep]
    with mu._partner[0]:
        psys.restore_snapshot(small)
    system = hoomd.context.current.system
    total0 = system.state.N + psys.state.N      # 48 + 12 = 60
    hoomd.run(80, quiet=True)
    N1 = system.state.N
    N2 = psys.state.N
    assert N1 + N2 == total0
    assert mu.n_transferred > 0
    # imbalance (36) must shrink substantially toward 0
    assert abs(N1 - N2) < 24, (N1, N2)
    assert mc.count_overlaps() == 0


def test_clusters_line_reflection_and_swap():
    """Line reflections + AB swap moves keep the hard-sphere config
    valid; swaps exchange type identities in place."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    rng = np.random.RandomState(11)
    N = 40
    placed = []
    while len(placed) < N:
        x = rng.uniform(-4.9, 4.9, 3)
        if all(np.linalg.norm(((x - p + 5) % 10) - 5) > 1.05
               for p in placed):
            placed.append(x)
    snap = hoomd.data.make_snapshot(N, hoomd.data.boxdim(L=10),
                                    particle_types=['A', 'B'])
    snap.particles.position[:] = placed
    snap.particles.typeid[:] = (np.arange(N) % 2)
    hoomd.init.read_snapshot(snap)
    mc = hpmc.integrate.sphere(seed=5, d=0.15)
    mc.shape_param.set('A', diameter=1.0)
    mc.shape_param.set('B', diameter=0.8)
    cl = hpmc.update.clusters(mc=mc, seed=9, period=1,
                              swap_move_ratio=0.5,
                              swap_types=['A', 'B'])
    system = hoomd.context.current.system
    hoomd.run(40, quiet=True)
    assert mc.count_overlaps() == 0
    assert cl.n_moves >= 40
    assert cl.n_swaps > 0
    # type identities remain a permutation of {A,B} counts summing to N
    tid = np.asarray(system.take_snapshot().particles.typeid)
    assert len(tid) == N and set(np.unique(tid)) <= {0, 1}


def test_clusters_swap_moved_vs_moved_veto():
    """Adversarial unequal-diameter swap (ratio 1.25): two B spheres
    (d=0.8) at distance 0.95 are valid and share no adjacency edge
    (edge threshold r_swp+r_now = 0.9), but both connect to one A
    placed between them (A-B threshold 1.0).  A B->A swap of that
    cluster grows both B's to d=1.0 and they would overlap at 0.95 —
    the move must be vetoed (reference UpdaterClusters.h rejects
    moved-moved overlap-creating configurations)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    snap = hoomd.data.make_snapshot(3, hoomd.data.boxdim(L=12),
                                    particle_types=['A', 'B'])
    snap.particles.position[:] = [[0.475, 0.8, 0.0],    # A (bridge)
                                  [0.0, 0.0, 0.0],      # B
                                  [0.95, 0.0, 0.0]]     # B
    snap.particles.typeid[:] = [0, 1, 1]
    hoomd.init.read_snapshot(snap)
    mc = hpmc.integrate.sphere(seed=3, d=0.0)
    mc.shape_param.set('A', diameter=1.0)
    mc.shape_param.set('B', diameter=0.8)
    assert mc.count_overlaps() == 0
    cl = hpmc.update.clusters(mc=mc, seed=13, period=1,
                              swap_move_ratio=1.0,
                              swap_types=['A', 'B'])
    # check after EVERY step: an accepted overlap-creating swap is
    # undone by the next swap (the move is an involution), so an
    # end-of-run check alone can alias to zero
    for _ in range(6):
        hoomd.run(1, quiet=True)
        assert mc.count_overlaps() == 0
    assert cl.n_moves >= 6
