"""Implicit depletants + interaction matrix (reference
IntegratorHPMCMonoImplicit.h; hpmc/integrate.py interaction_matrix).

Physics validation: two hard spheres in an implicit depletant bath must
sample the Asakura-Oosawa pair distribution P(r) ~ r^2 exp(-U_AO(r)),
U_AO(r) = -nR * V_lens(r) — the exact effective potential of a
penetrable-hard-sphere bath (the reference validates depletants the same
way, hpmc/validation/spheres_implicit.py).
"""

import numpy as np
import pytest

import hoomd_tpu as hoomd
from hoomd_tpu import hpmc


def _two_sphere_snapshot(L=4.0):
    snap = hoomd.data.make_snapshot(
        N=2, box=hoomd.data.boxdim(L=L),
        particle_types=['A', 'B'])
    snap.particles.position[0] = (-0.6, 0.0, 0.0)
    snap.particles.position[1] = (0.6, 0.0, 0.0)
    snap.particles.typeid[:] = 0
    return snap


def test_interaction_matrix_api():
    hoomd.init.read_snapshot(_two_sphere_snapshot())
    mc = hpmc.integrate.sphere(seed=1, d=0.1)
    mc.shape_param.set('A', diameter=1.0)
    mc.shape_param.set('B', diameter=0.5)
    assert mc.overlap_checks.get('A', 'B')
    mc.overlap_checks.set('A', 'B', enable=False)
    assert not mc.overlap_checks.get('A', 'B')
    assert not mc.overlap_checks.get('B', 'A')
    m = mc.overlap_checks.matrix(['A', 'B'])
    assert m[0, 0] and not m[0, 1] and not m[1, 0] and m[1, 1]


def test_interaction_matrix_disables_overlaps():
    # two overlapping B spheres count as an overlap only when enabled
    snap = hoomd.data.make_snapshot(
        N=2, box=hoomd.data.boxdim(L=6.0), particle_types=['A', 'B'])
    snap.particles.position[0] = (0.0, 0.0, 0.0)
    snap.particles.position[1] = (0.3, 0.0, 0.0)
    snap.particles.typeid[:] = 1
    hoomd.init.read_snapshot(snap)
    mc = hpmc.integrate.sphere(seed=1, d=0.05)
    mc.shape_param.set('A', diameter=1.0)
    mc.shape_param.set('B', diameter=1.0)
    assert mc.count_overlaps() == 1
    mc.overlap_checks.set('B', 'B', enable=False)
    assert mc.count_overlaps() == 0


def _u_ao(r, nR, R):
    """AO potential: -nR * lens volume of two radius-R spheres at r."""
    v = np.where(r < 2 * R,
                 (np.pi / 12.0) * (2 * R - r) ** 2 * (4 * R + r), 0.0)
    return -nR * v


@pytest.mark.slow
def test_implicit_depletants_ao_distribution():
    nR = 3.0
    D, d_dep = 1.0, 0.5
    R = 0.5 * (D + d_dep)            # exclusion-sphere radius 0.75
    L = 4.0
    hoomd.init.read_snapshot(_two_sphere_snapshot(L))
    system = hoomd.context.current.system
    mc = hpmc.integrate.sphere(seed=7, d=0.25, nselect=2, implicit=True)
    mc.shape_param.set('A', diameter=D)
    mc.shape_param.set('B', diameter=d_dep)
    mc.set_params(nR=nR, depletant_type='B')

    system.run(200)                   # equilibrate
    rs = []
    for _ in range(3000):
        system.run(4)
        p = system.state.pos
        dr = np.asarray(system.state.box.min_image(p[0] - p[1]))
        rs.append(float(np.linalg.norm(dr)))
    rs = np.asarray(rs)

    # observed vs analytic ratio of AO-well occupancy to a flat window
    well = (rs > 1.02) & (rs < 1.48)
    flat = (rs > 1.55) & (rs < 1.95)
    n_w, n_f = well.sum(), flat.sum()
    assert n_f > 100, "not enough flat-region samples"

    def integrate(lo, hi, f):
        x = np.linspace(lo, hi, 2001)
        return np.trapezoid(f(x), x)

    exp_w = integrate(1.02, 1.48,
                      lambda r: r ** 2 * np.exp(-_u_ao(r, nR, R)))
    exp_f = integrate(1.55, 1.95, lambda r: r ** 2)
    expected = exp_w / exp_f
    observed = n_w / n_f
    # ~3.4k correlated samples: generous 25% band still cleanly separates
    # the AO enhancement (expected ~1.6-1.9x the ideal ratio) from the
    # no-depletant null (ratio = ideal)
    assert abs(observed - expected) / expected < 0.25, \
        (observed, expected)
    # null check: without the well enhancement the ratio would be
    null = integrate(1.02, 1.48, lambda r: r ** 2) / exp_f
    assert observed > null * 1.15, (observed, null)


def test_implicit_requires_flag():
    hoomd.init.read_snapshot(_two_sphere_snapshot())
    mc = hpmc.integrate.sphere(seed=1)
    mc.shape_param.set('A', diameter=1.0)
    mc.shape_param.set('B', diameter=0.5)
    with pytest.raises(RuntimeError):
        mc.set_params(nR=1.0)
