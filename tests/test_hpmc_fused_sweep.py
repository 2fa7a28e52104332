"""Fused-sweep Pallas HPMC path (hpmc/pallas_sweep.py, interpret mode).

The fused path replaces 8*nselect sequential XLA sub-sweeps with one
VMEM-resident Pallas kernel per round (per re-bin).  These tests force
it on the CPU suite via HOOMD_TPU_HPMC_FUSED=on (interpret mode) and
check the sampling invariants the gather path's tests rely on: hard
validity after every sweep, real movement, counter consistency, and
multi-type mixtures."""

import os

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _env():
    os.environ['HOOMD_TPU_HPMC_FUSED'] = 'on'
    yield
    os.environ.pop('HOOMD_TPU_HPMC_FUSED', None)


def test_fused_sphere_validity_and_movement():
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.4), n=5)
    mc = hpmc.integrate.sphere(seed=7, d=0.15)
    mc.shape_param.set('A', diameter=1.0)
    system = hoomd.context.current.system
    p0 = np.asarray(system.take_snapshot().particles.position).copy()
    hoomd.run(5, quiet=True)
    assert system._program.get('fused')
    assert mc.count_overlaps() == 0
    c = mc.get_counters()
    n_try = int(c['translate_accept']) + int(c['translate_reject'])
    assert n_try > 0 and int(c['translate_accept']) > 0
    pos = np.asarray(system.take_snapshot().particles.position)
    assert np.abs(pos - p0).max() > 0.02


def test_fused_sphere_mixture_validity():
    """Binary mixture with different diameters: the per-slot radius
    plane must respect both types (pair threshold r_i + r_j)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    rng = np.random.RandomState(3)
    N = 60
    L = 10.0
    placed = []
    while len(placed) < N:
        x = rng.uniform(-L / 2 + .1, L / 2 - .1, 3)
        if all(np.linalg.norm(((x - p + L / 2) % L) - L / 2) > 1.05
               for p in placed):
            placed.append(x)
    snap = hoomd.data.make_snapshot(N, hoomd.data.boxdim(L=L),
                                    particle_types=['A', 'B'])
    snap.particles.position[:] = placed
    snap.particles.typeid[:] = (np.arange(N) % 2)
    hoomd.init.read_snapshot(snap)
    mc = hpmc.integrate.sphere(seed=5, d=0.2)
    mc.shape_param.set('A', diameter=1.0)
    mc.shape_param.set('B', diameter=0.6)
    system = hoomd.context.current.system
    hoomd.run(4, quiet=True)
    assert system._program.get('fused')
    assert mc.count_overlaps() == 0
    # host-side cross check with the true pair thresholds
    s = system.take_snapshot()
    pos = np.asarray(s.particles.position)
    tid = np.asarray(s.particles.typeid)
    r = np.where(tid == 0, 0.5, 0.3)
    d = pos[:, None] - pos[None]
    d -= L * np.round(d / L)
    r2 = (d * d).sum(-1)
    np.fill_diagonal(r2, 1e9)
    thr = (r[:, None] + r[None, :]) ** 2
    assert (r2 > thr - 1e-6).all()


def test_fused_dense_liquid_acceptance():
    """Dense-ish liquid: acceptance must be strictly between 0 and 1
    (the overlap veto actually fires) and validity holds sweep by
    sweep."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    a = 1.15
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=5)
    mc = hpmc.integrate.sphere(seed=11, d=0.3)
    mc.shape_param.set('A', diameter=1.0)
    system = hoomd.context.current.system
    for _ in range(3):
        hoomd.run(1, quiet=True)
        assert mc.count_overlaps() == 0
    assert system._program.get('fused')
    c = mc.get_counters()
    acc = int(c['translate_accept'])
    rej = int(c['translate_reject'])
    assert acc > 0 and rej > 0          # veto fires, moves happen


def test_fused_convex_polyhedron_validity():
    """Fused SAT sweep for cubes: translations + rotations at phi=0.5
    with large moves, validated sweep-by-sweep against the independent
    gather-path SAT (count_overlaps)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    phi = 0.5
    a = (1.0 / phi) ** (1.0 / 3.0)
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=4)
    system = hoomd.context.current.system
    mc = hpmc.integrate.convex_polyhedron(seed=11, d=0.25, a=0.4)
    verts = 0.5 * np.array([[sx, sy, sz] for sx in (-1, 1)
                            for sy in (-1, 1) for sz in (-1, 1)])
    mc.shape_param.set('A', vertices=verts)
    q0 = np.asarray(system.take_snapshot().particles.orientation).copy()
    for _ in range(4):
        hoomd.run(1, quiet=True)
        assert mc.count_overlaps() == 0
    assert system._program.get('fused')
    c = mc.get_counters()
    assert int(c['translate_accept']) > 0
    assert int(c['rotate_accept']) > 0
    q1 = np.asarray(system.take_snapshot().particles.orientation)
    assert np.abs(q1 - q0).max() > 0.01
