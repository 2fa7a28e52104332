"""Sharded cell-major MD (parallel/cellmd.py): trajectory parity vs a
dense O(N^2) oracle, migration/ghost correctness over the virtual
8-device CPU mesh."""

import numpy as np
import pytest


def lj_oracle_traj(pos, vel, L, dt, rcut, nsteps, eps=1.0, sig=1.0):
    pos = pos.copy().astype(np.float64)
    vel = vel.copy().astype(np.float64)
    lj1 = 4 * eps * sig ** 12
    lj2 = 4 * eps * sig ** 6
    rc2 = rcut * rcut

    def forces(p):
        d = p[:, None, :] - p[None, :, :]
        d -= L * np.round(d / L)
        r2 = np.sum(d * d, axis=-1)
        np.fill_diagonal(r2, 1e9)
        ok = r2 < rc2
        r2s = np.where(ok, r2, 1.0)
        r2i = 1.0 / r2s
        r6i = r2i ** 3
        f = np.where(ok, r2i * r6i * (12 * lj1 * r6i - 6 * lj2), 0.0)
        return np.sum(f[:, :, None] * d, axis=1)

    frc = forces(pos)
    for _ in range(nsteps):
        vel += 0.5 * dt * frc
        pos += dt * vel
        pos -= L * np.round(pos / L)
        frc = forces(pos)
        vel += 0.5 * dt * frc
    ke = 0.5 * np.sum(vel ** 2)
    return pos, vel, ke


@pytest.fixture
def mesh4():
    import jax
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:4]), ('domain',))


def _nonoverlapping(rng, N, L, dmin=0.95):
    placed = []
    while len(placed) < N:
        x = rng.uniform(-L / 2, L / 2, 3)
        d = [np.linalg.norm(((x - p + L / 2) % L) - L / 2)
             for p in placed]
        if not d or min(d) > dmin:
            placed.append(x)
    return np.asarray(placed)


def test_cellmd_matches_oracle(mesh4):
    from hoomd_tpu.parallel.cellmd import build_cell_md
    rng = np.random.RandomState(0)
    N, L, rcut = 260, 16.0, 1.5
    pos0 = _nonoverlapping(rng, N, L)
    vel0 = rng.normal(0, 0.5, (N, 3))
    vel0 -= vel0.mean(axis=0)

    k = 4
    init_fn, run_fn, gather_fn = build_cell_md(
        mesh4, N, L, dt=0.002, rcut=rcut, r_buff=0.3, k_rebuild=k)
    carry = init_fn(pos0, vel0)
    nwin = 10                                       # 40 steps
    carry, th = run_fn(carry, nwin)
    assert not bool(th['overflow'])
    assert not bool(th['danger'])
    assert int(th['n_owned']) == N
    p_dd, v_dd = gather_fn(carry)
    p_ref, v_ref, ke_ref = lj_oracle_traj(pos0, vel0, L, 0.002, rcut,
                                          nwin * k)
    d = p_dd - p_ref
    d -= L * np.round(d / L)
    assert np.abs(d).max() < 1e-3, np.abs(d).max()
    assert np.abs(v_dd - v_ref).max() < 1e-3
    np.testing.assert_allclose(float(th['ke']), ke_ref, rtol=1e-4)


def test_cellmd_migration_and_conservation(mesh4):
    """Longer run: particles migrate across shard boundaries; N and
    energy stay conserved (NVE)."""
    from hoomd_tpu.parallel.cellmd import build_cell_md
    rng = np.random.RandomState(5)
    N, L, rcut = 220, 16.0, 1.5
    pos0 = _nonoverlapping(rng, N, L)
    vel0 = rng.normal(0, 0.6, (N, 3))
    vel0 -= vel0.mean(axis=0)
    init_fn, run_fn, gather_fn = build_cell_md(
        mesh4, N, L, dt=0.003, rcut=rcut, r_buff=0.3, k_rebuild=4)
    carry = init_fn(pos0, vel0)
    carry, th0 = run_fn(carry, 2)
    e0 = float(th0['ke'] + th0['pe'])
    carry, th1 = run_fn(carry, 60)                   # 240 more steps
    assert int(th1['n_owned']) == N
    assert not bool(th1['overflow'])
    e1 = float(th1['ke'] + th1['pe'])
    assert abs(e1 - e0) / max(abs(e0), 1.0) < 5e-3, (e0, e1)
    p, _ = gather_fn(carry)
    assert np.abs(p - pos0).max() > 0.5              # real motion
