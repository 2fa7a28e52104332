"""HPMC hard walls + wall updater (reference ExternalFieldWall.h,
UpdaterExternalFieldWall.h)."""

import numpy as np

import hoomd_tpu as hoomd
from hoomd_tpu import hpmc, md


def _setup(R=3.0):
    rng = np.random.RandomState(2)
    N = 20
    placed = []
    while len(placed) < N:
        x = rng.uniform(-1.6, 1.6, 3)
        if np.linalg.norm(x) > R - 0.5:
            continue
        if all(np.linalg.norm(x - p) > 1.02 for p in placed):
            placed.append(x)
    snap = hoomd.data.make_snapshot(N, hoomd.data.boxdim(L=12))
    snap.particles.position[:] = placed
    hoomd.init.read_snapshot(snap)
    mc = hpmc.integrate.sphere(seed=3, d=0.2)
    mc.shape_param.set('A', diameter=1.0)
    walls = md.wall.group(md.wall.sphere(r=R, origin=(0, 0, 0),
                                         inside=True))
    field = hpmc.field.wall(mc, walls)
    return mc, walls, field


def test_hard_wall_confines_spheres():
    mc, walls, field = _setup(R=3.0)
    system = hoomd.context.current.system
    assert field.count_overlaps() == 0
    hoomd.run(60, quiet=True)
    pos = np.asarray(system.state.pos)
    rad = np.linalg.norm(pos, axis=1)
    # every sphere center stays within R - r = 2.5
    assert rad.max() <= 2.5 + 1e-5, rad.max()
    assert mc.count_overlaps() == 0


def test_wall_updater_compression():
    mc, walls, field = _setup(R=3.2)

    def shrink(timestep):
        walls.spheres[0].r = max(2.55, walls.spheres[0].r - 0.05)

    up = hpmc.update.wall(mc, walls, shrink, move_ratio=1.0, seed=5,
                          period=5)
    hoomd.run(120, quiet=True)
    assert up.get_total_count() > 0
    assert up.get_accepted_count() > 0
    assert walls.spheres[0].r < 3.2          # compression happened
    assert field.count_overlaps() == 0       # never into an invalid state
    system = hoomd.context.current.system
    pos = np.asarray(system.state.pos)
    assert np.linalg.norm(pos, axis=1).max() <= walls.spheres[0].r - 0.5 \
        + 1e-5
