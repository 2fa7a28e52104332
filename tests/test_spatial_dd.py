"""Spatial domain decomposition: halo exchange + migration parity against
a float64 single-process oracle (the reference tests DD correctness the
same way: mpirun-oversubscribed vs serial, test_communication.py)."""

import numpy as np
import pytest


def lj_oracle_traj(pos0, vel0, L, dt, rcut, nsteps, lj1=4.0, lj2=4.0):
    """Pure numpy float64 velocity-Verlet with shifted LJ."""
    pos = pos0.astype(np.float64).copy()
    vel = vel0.astype(np.float64).copy()
    rc2 = rcut * rcut
    rc6i = 1.0 / rc2 ** 3
    e_shift = rc6i * (lj1 * rc6i - lj2)

    def forces(p):
        dr = p[:, None] - p[None, :]
        dr -= L * np.round(dr / L)
        r2 = (dr ** 2).sum(-1)
        np.fill_diagonal(r2, 1e9)
        ok = r2 < rc2
        r6i = 1.0 / r2 ** 3
        fdivr = np.where(ok, (12 * lj1 * r6i - 6 * lj2) * r6i / r2, 0.0)
        e = 0.5 * np.where(ok, r6i * (lj1 * r6i - lj2) - e_shift,
                           0.0).sum()
        return (fdivr[:, :, None] * dr).sum(axis=1), e

    frc = np.zeros_like(pos)
    for _ in range(nsteps):
        vel += 0.5 * dt * frc
        pos += dt * vel
        pos -= L * np.round(pos / L)
        frc, pe = forces(pos)
        vel += 0.5 * dt * frc
    ke = 0.5 * (vel ** 2).sum()
    return pos, vel, ke, pe


@pytest.fixture
def mesh4():
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:4]), ('domain',))


def test_spatial_dd_matches_oracle(mesh4):
    import jax
    from hoomd_tpu.parallel.spatial import build_spatial_lj_md
    rng = np.random.RandomState(0)
    # lattice spacing 1.2 < r_cut 1.5: every particle interacts, and
    # pairs straddle every slab cut (a sparser start once validated only
    # ballistic streaming — zero interacting pairs)
    L, rcut = 12.0, 1.5
    grid = np.stack(np.meshgrid(*[np.arange(10)] * 3,
                                indexing='ij'), -1).reshape(-1, 3)
    N = len(grid)
    pos0 = (grid + 0.5) * (L / 10) - L / 2 \
        + rng.uniform(-0.05, 0.05, (N, 3))
    vel0 = rng.normal(0, 0.3, (N, 3))
    vel0 -= vel0.mean(axis=0)

    step_fn, init_fn, run_steps, gather_fn, rebalance_fn = \
        build_spatial_lj_md(
        mesh4, N, L, dt=0.002, rcut=rcut, r_buff=0.3)
    carry = init_fn(pos0, vel0)
    nsteps = 30
    carry, ths = jax.jit(run_steps, static_argnums=1)(carry, nsteps)
    assert int(np.asarray(ths['overflow'][-1])) == 0
    # every particle still owned exactly once
    assert int(np.asarray(ths['n_owned'][-1])) == N
    p_dd, v_dd = gather_fn(carry)

    p_ref, v_ref, ke_ref, pe_ref = lj_oracle_traj(
        pos0, vel0, L, 0.002, rcut, nsteps)
    # load-bearing check: the oracle itself must see real interactions
    assert abs(pe_ref) > 0.05 * N
    # wrap-consistent comparison
    d = p_dd - p_ref
    d -= L * np.round(d / L)
    assert np.abs(d).max() < 2e-3
    assert np.abs(v_dd - v_ref).max() < 2e-2
    np.testing.assert_allclose(float(ths['ke'][-1]), ke_ref, rtol=1e-4)
    np.testing.assert_allclose(float(ths['pe'][-1]), pe_ref, rtol=1e-3,
                               atol=1e-3)


def test_spatial_dd_migration_happens(mesh4):
    """Long enough run that particles actually change owners; ownership
    count stays exactly N (no loss, no duplication)."""
    import jax
    from hoomd_tpu.parallel.spatial import build_spatial_lj_md
    rng = np.random.RandomState(1)
    N, L, rcut = 200, 16.0, 1.5
    pos0 = rng.uniform(-L / 2, L / 2, (N, 3))
    # spread out to avoid overlaps: relax via min-distance rejection
    ok = False
    while not ok:
        dr = pos0[:, None] - pos0[None, :]
        dr -= L * np.round(dr / L)
        r = np.linalg.norm(dr, axis=-1) + np.eye(N) * 1e9
        if r.min() > 0.9:
            ok = True
        else:
            i = np.unravel_index(np.argmin(r), r.shape)[0]
            pos0[i] = rng.uniform(-L / 2, L / 2, 3)
    vel0 = rng.normal(0, 1.0, (N, 3))
    step_fn, init_fn, run_steps, gather_fn, rebalance_fn = \
        build_spatial_lj_md(
        mesh4, N, L, dt=0.003, rcut=rcut, r_buff=0.3)
    carry = init_fn(pos0, vel0)
    carry, ths = jax.jit(run_steps, static_argnums=1)(carry, 200)
    n = np.asarray(ths['n_owned'])
    assert (n == N).all()
    assert int(np.asarray(ths['overflow']).max()) == 0
    p, v = gather_fn(carry)
    assert np.abs(p - pos0).max() > 0.5   # things moved (and migrated)
    # energy sane
    assert np.isfinite(float(ths['ke'][-1] + ths['pe'][-1]))


def test_spatial_dd_load_balancer(mesh4):
    """rebalance_fn (reference LoadBalancer) shifts slab cuts toward
    uniform counts for a density-imbalanced start, and the physics
    keeps running correctly afterwards (N conserved, no overflow)."""
    import jax
    from hoomd_tpu.parallel.spatial import build_spatial_lj_md
    rng = np.random.RandomState(3)
    N, L, rcut = 240, 16.0, 1.5
    # all particles crowded into the left half of the box
    pos0 = np.zeros((N, 3))
    placed = []
    while len(placed) < N:
        x = rng.uniform([-L / 2, -L / 2, -L / 2], [0.0, L / 2, L / 2])
        if all(np.linalg.norm(((x - p + L / 2) % L) - L / 2) > 0.95
               for p in placed):
            placed.append(x)
    pos0[:] = placed
    vel0 = rng.normal(0, 0.3, (N, 3))
    # slot capacity sized for the transient: a rebalancing cut shift
    # moves a slab-edge slice wholesale, so receiving shards briefly
    # hold well above the balanced average (overflow is flagged, but
    # this test wants the clean path)
    step_fn, init_fn, run_steps, gather_fn, rebalance_fn = \
        build_spatial_lj_md(mesh4, N, L, dt=0.002, rcut=rcut, r_buff=0.3,
                            slot_cap=N, ghost_cap=N)
    carry = init_fn(pos0, vel0)

    def imbalance(carry):
        pos, vel, frc, tag, ts, cuts = carry
        tag_h = np.asarray(tag)
        x = np.asarray(pos)[tag_h >= 0, 0]
        c = np.asarray(cuts)
        counts = np.array([np.sum((x >= c[s]) & (x < c[s + 1]))
                           for s in range(4)], float)
        return counts.max() / max(counts.mean(), 1.0)

    imb0 = imbalance(carry)
    assert imb0 > 1.5                      # genuinely imbalanced start
    for _ in range(12):
        carry = rebalance_fn(carry)
        carry, ths = jax.jit(run_steps, static_argnums=1)(carry, 5)
    imb1 = imbalance(carry)
    assert int(np.asarray(ths['overflow']).max()) == 0
    assert int(np.asarray(ths['n_owned'][-1])) == N
    assert imb1 < imb0 * 0.75, (imb0, imb1)
