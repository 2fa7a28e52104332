"""constrain.distance: SHAKE/RATTLE keeps pair distances fixed during
NVE dynamics with shared-atom constraint chains."""

import numpy as np
import pytest


def test_constraint_chain_holds_distances():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize("--notice-level=0")
    snap = hoomd.data.make_snapshot(3, hoomd.data.boxdim(L=20))
    snap.particles.position[:] = [[-1.0, 0, 0], [0, 0, 0], [1.0, 0, 0]]
    rng = np.random.RandomState(0)
    v = rng.normal(0, 0.6, (3, 3))
    v -= v.mean(axis=0)
    snap.particles.velocity[:] = v
    snap.constraints.resize(2)
    snap.constraints.group[:] = [[0, 1], [1, 2]]
    snap.constraints.value[:] = [1.0, 1.0]
    hoomd.init.read_snapshot(snap)
    md.constrain.distance()
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nve(group=hoomd.group.all())
    system = hoomd.context.current.system
    hoomd.run(300, quiet=True)
    snap2 = system.take_snapshot()
    p = snap2.particles.position
    d01 = np.linalg.norm(p[0] - p[1])
    d12 = np.linalg.norm(p[1] - p[2])
    assert d01 == pytest.approx(1.0, abs=5e-3)
    assert d12 == pytest.approx(1.0, abs=5e-3)
    # velocities have no radial component along the constraints
    vv = snap2.particles.velocity
    for (i, j) in ((0, 1), (1, 2)):
        d = p[i] - p[j]
        rad = abs(np.dot(vv[i] - vv[j], d) / np.linalg.norm(d))
        assert rad < 5e-2
    # something actually moved (not frozen)
    assert np.abs(vv).max() > 0.05
