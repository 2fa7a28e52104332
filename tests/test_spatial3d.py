"""3-D spatial DD oracle tests: a 2x2x2 ('domain_z','domain_y',
'domain_x') mesh must reproduce the dense single-device trajectory with
interacting pairs across faces, edges, AND corners (the corner ghosts
only arrive via the third staged sweep — a missing z-forwarding of
x/y-ghosts fails these), and the load balancer must iterate to tolerance
over all three cut vectors (reference LoadBalancer.h:46-144,
DomainDecomposition.h:49-175)."""

import numpy as np
import pytest

import jax


def _mesh_2x2x2():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import Mesh
    return Mesh(np.array(devs[:8]).reshape(2, 2, 2),
                ('domain_z', 'domain_y', 'domain_x'))


def _dense_reference(pos, vel, L, dt, rcut, steps):
    """Float64 dense NVE oracle (same shifted-LJ math)."""
    pos = pos.astype(np.float64).copy()
    vel = vel.astype(np.float64).copy()
    rc2 = rcut * rcut
    rc6i = 1.0 / rc2 ** 3
    e_shift = rc6i * (4.0 * rc6i - 4.0)

    def forces(p):
        dr = p[:, None, :] - p[None, :, :]
        dr -= L * np.round(dr / L)
        r2 = np.sum(dr * dr, axis=-1)
        np.fill_diagonal(r2, np.inf)
        ok = r2 < rc2
        r2i = np.where(ok, 1.0 / r2, 0.0)
        r6i = r2i ** 3
        fdivr = r2i * r6i * (48.0 * r6i - 24.0)
        f = np.sum(np.where(ok, fdivr, 0.0)[:, :, None] * dr, axis=1)
        pe = 0.5 * np.sum(np.where(ok, 4.0 * r6i * (r6i - 1.0)
                                   - e_shift, 0.0))
        return f, pe

    f, _ = forces(pos)
    for _ in range(steps):
        vel += 0.5 * dt * f
        pos += dt * vel
        pos -= L * np.round(pos / L)
        f, pe = forces(pos)
        vel += 0.5 * dt * f
    return pos, vel, pe


def _config(n=10, spacing=1.1, seed=12):
    """sc lattice with spacing < rcut: every particle interacts across
    every shard boundary, including the 8 corner octant meeting points."""
    L = n * spacing
    g = (np.arange(n) + 0.5) * spacing - L / 2
    pos = np.stack(np.meshgrid(g, g, g, indexing='ij'),
                   axis=-1).reshape(-1, 3)
    rng = np.random.RandomState(seed)
    vel = rng.normal(0, 0.3, pos.shape)
    vel -= vel.mean(axis=0)
    return pos, vel, L


def test_spatial3d_matches_dense_oracle():
    mesh = _mesh_2x2x2()
    from hoomd_tpu.parallel.spatial3d import build_spatial3d_lj_md
    pos0, vel0, L = _config()
    dt, rcut, steps = 0.002, 2.5, 20
    step_fn, init_fn, run_steps, gather_fn, _ = build_spatial3d_lj_md(
        mesh, len(pos0), L, dt=dt, rcut=rcut, r_buff=0.4)
    carry = init_fn(pos0, vel0)
    carry, th = run_steps(carry, steps)
    assert int(th['overflow'][-1]) == 0
    assert int(th['n_owned'][-1]) == len(pos0)   # ownership conserved
    pe_shard = float(th['pe'][-1])
    pos_ref, vel_ref, pe_ref = _dense_reference(pos0, vel0, L, dt,
                                                rcut, steps)
    # load-bearing: the lattice interacts strongly
    assert pe_ref < -100.0
    assert pe_shard == pytest.approx(pe_ref, rel=2e-4)
    pos_g, vel_g = gather_fn(carry)
    dr = pos_g - pos_ref
    dr -= L * np.round(dr / L)
    assert np.abs(dr).max() < 2e-3
    np.testing.assert_allclose(vel_g, vel_ref, atol=2e-3)


def test_spatial3d_corner_ghosts_are_load_bearing():
    """Zeroing cross-octant interactions must change the energy: compare
    against a deliberately wrong oracle keeping only intra-octant pairs
    (guards against a silently-dead staged sweep)."""
    mesh = _mesh_2x2x2()
    from hoomd_tpu.parallel.spatial3d import build_spatial3d_lj_md
    pos0, vel0, L = _config()
    step_fn, init_fn, run_steps, gather_fn, _ = build_spatial3d_lj_md(
        mesh, len(pos0), L, dt=0.0, rcut=2.5, r_buff=0.4)
    carry = init_fn(pos0, vel0)
    carry, th = run_steps(carry, 1)
    pe = float(th['pe'][-1])
    rc2 = 2.5 ** 2
    rc6i = 1.0 / rc2 ** 3
    e_shift = rc6i * (4.0 * rc6i - 4.0)
    own = sum(np.clip(((pos0[:, c] + L / 2) // (L / 2)).astype(int),
                      0, 1) * (1 << c)
              for c in range(3))
    dr = pos0[:, None, :] - pos0[None, :, :]
    dr -= L * np.round(dr / L)
    r2 = np.sum(dr * dr, axis=-1)
    np.fill_diagonal(r2, np.inf)
    ok = (r2 < rc2) & (own[:, None] == own[None, :])
    r6i = np.where(ok, 1.0 / r2 ** 3, 0.0)
    pe_intra = 0.5 * np.sum(np.where(ok, 4.0 * r6i * (r6i - 1.0)
                                     - e_shift, 0.0))
    assert abs(pe - pe_intra) > 0.05 * abs(pe)


def test_spatial3d_load_balance_iterates_to_tolerance():
    """Skewed density: a dense slab in x < 0 plus dilute background.
    Uniform cuts leave a large imbalance; rebalance_until must bring the
    worst marginal imbalance within 10% over all three axes."""
    mesh = _mesh_2x2x2()
    from hoomd_tpu.parallel.spatial3d import (AXES, COORD,
                                              build_spatial3d_lj_md)
    rng = np.random.RandomState(5)
    L = 32.0
    n_dense = 384
    n_dilute = 128
    pd = np.stack([rng.uniform(-L / 2, 0, n_dense),
                   rng.uniform(-L / 2, L / 2, n_dense),
                   rng.uniform(-L / 2, L / 2, n_dense)], axis=1)
    pu = rng.uniform(-L / 2, L / 2, (n_dilute, 3))
    pos0 = np.concatenate([pd, pu])
    vel0 = np.zeros_like(pos0)
    step_fn, init_fn, run_steps, gather_fn, rebalance_until = \
        build_spatial3d_lj_md(mesh, len(pos0), L, dt=0.0, rcut=2.5,
                              r_buff=0.4, slot_cap=512, ghost_cap=512)
    carry = init_fn(pos0, vel0)

    def imbalance(carry):
        pos, vel, frc, tag, ts, cuts = carry
        pos_h, tag_h = np.asarray(pos), np.asarray(tag)
        sel = tag_h >= 0
        worst = 0.0
        for a in AXES:
            ch = np.asarray(cuts[a])
            x = pos_h[sel, COORD[a]]
            na = np.array([np.sum((x >= ch[s]) & (x < ch[s + 1]))
                           for s in range(len(ch) - 1)], float)
            worst = max(worst, np.abs(na / na.mean() - 1).max())
        return worst

    imb0 = imbalance(carry)
    assert imb0 > 0.5                      # the skew is real
    carry = rebalance_until(carry, tol=0.10, max_iters=30)
    imb1 = imbalance(carry)
    assert imb1 <= 0.10, (imb0, imb1)
    # no particles lost in the iterated migrations
    pos, vel, frc, tag, ts, cuts = carry
    tag_h = np.asarray(tag)
    assert np.sum(tag_h >= 0) == len(pos0)
    assert sorted(tag_h[tag_h >= 0]) == list(range(len(pos0)))
