"""Multi-chip sharded MD on the virtual 8-device CPU mesh
(the reference's mpirun-oversubscription test strategy,
hoomd/test-py/test_communication.py)."""

import numpy as np
import pytest


def _lattice(N, L, jitter, seed=0):
    rng = np.random.RandomState(seed)
    side = int(np.ceil(N ** (1 / 3)))
    grid = np.stack(np.meshgrid(*[np.arange(side)] * 3,
                                indexing='ij'), -1).reshape(-1, 3)[:N]
    return ((grid + 0.5) * (L / side) - L / 2
            + rng.uniform(-jitter, jitter, (N, 3)))


@pytest.fixture
def mesh8():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from hoomd_tpu.parallel.mesh import make_mesh
    return make_mesh(n_replica=2, n_domain=4)


def test_sharded_energy_matches_oracle(mesh8):
    import jax
    from hoomd_tpu.parallel.domain import build_sharded_lj_md
    N, L = 64, 5.0
    pos1 = _lattice(N, L, 0.05)
    dr = pos1[None] - pos1[:, None]
    dr -= L * np.round(dr / L)
    r2 = (dr ** 2).sum(-1)[np.triu_indices(N, 1)]
    r2 = r2[r2 < 4.0]
    inv6 = 1 / r2 ** 3
    rc6i = 1 / 2.0 ** 6
    eref = np.sum(4 * (inv6 ** 2 - inv6) - 4 * (rc6i ** 2 - rc6i))
    step_fn, init_fn, _ = build_sharded_lj_md(
        mesh8, N, L, dt=0.0, rcut=2.0, r_buff=0.3, kT=None, max_neigh=64)
    carry, th = jax.jit(step_fn)(init_fn(
        np.tile(pos1[None], (2, 1, 1)), np.zeros((2, N, 3))))
    pe = np.asarray(th['pe'])
    np.testing.assert_allclose(pe, eref, rtol=1e-4)


def test_sharded_nve_matches_single_device(mesh8):
    """Trajectory parity: 8-way sharded NVE == 1-device NVE, step for step
    (the decisive distributed-correctness check; deterministic because NVE
    has no RNG)."""
    import jax
    from hoomd_tpu.parallel.domain import build_sharded_lj_md
    from hoomd_tpu.parallel.mesh import make_mesh
    N, L = 128, 6.0
    pos1 = _lattice(N, L, 0.05, seed=3)
    vel1 = np.random.RandomState(4).normal(0, 0.5, (N, 3))

    def run(mesh, r):
        step_fn, init_fn, run_steps = build_sharded_lj_md(
            mesh, N, L, dt=0.001, rcut=2.0, r_buff=0.3, kT=None,
            max_neigh=96)
        carry = init_fn(np.tile(pos1[None], (r, 1, 1)),
                        np.tile(vel1[None], (r, 1, 1)))
        carry, ths = jax.jit(run_steps, static_argnums=1)(carry, 20)
        return (np.asarray(carry[0]), np.asarray(ths['ke'][-1]),
                np.asarray(ths['pe'][-1]))

    mesh1 = make_mesh(n_replica=1, n_domain=1,
                      devices=jax.devices()[:1])
    p1, ke1, pe1 = run(mesh1, 1)
    p8, ke8, pe8 = run(mesh8, 2)
    # same trajectory on every replica and vs single device
    np.testing.assert_allclose(p8[0], p8[1], atol=1e-6)
    np.testing.assert_allclose(p8[0], p1[0], atol=1e-4)
    np.testing.assert_allclose(ke8, ke1[0], rtol=1e-5)
    np.testing.assert_allclose(pe8, pe1[0], rtol=1e-4)


def test_sharded_nve_energy_conservation(mesh8):
    import jax
    from hoomd_tpu.parallel.domain import build_sharded_lj_md
    N, L = 128, 6.0
    step_fn, init_fn, run_steps = build_sharded_lj_md(
        mesh8, N, L, dt=0.001, rcut=2.0, r_buff=0.3, kT=None, max_neigh=96)
    carry = init_fn(np.tile(_lattice(N, L, 0.03, 5)[None], (2, 1, 1)),
                    np.tile(np.random.RandomState(6)
                            .normal(0, 0.3, (1, N, 3)), (2, 1, 1)))
    carry, ths = jax.jit(run_steps, static_argnums=1)(carry, 200)
    e = np.asarray(ths['ke'][:, 0] + ths['pe'][:, 0])
    assert np.isfinite(e).all()
    assert abs(e[-1] - e[0]) / N < 2e-3


def test_graft_entry_single_and_multichip():
    import jax
    import sys
    sys.path.insert(0, '/root/repo')
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out[0].pos)
    ge.dryrun_multichip(len(jax.devices()))
