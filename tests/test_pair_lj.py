"""LJ pair force: analytic two-particle checks (reference
md/test/test_lj_force.cc) and API wiring (reference
md/test-py/test_pair_lj.py)."""

import numpy as np
import pytest


def two_particle_system(r, L=20.0):
    import hoomd_tpu as hoomd
    snap = hoomd.data.make_snapshot(
        2, hoomd.data.boxdim(L=L), particle_types=['A'])
    snap.particles.position[0] = [-r / 2, 0, 0]
    snap.particles.position[1] = [r / 2, 0, 0]
    return hoomd.init.read_snapshot(snap)


def lj_analytic(r, eps=1.0, sig=1.0):
    v = 4 * eps * ((sig / r) ** 12 - (sig / r) ** 6)
    f = 4 * eps * (12 * sig ** 12 / r ** 13 - 6 * sig ** 6 / r ** 7)
    return v, f


@pytest.mark.parametrize("r", [0.95, 1.0, 2 ** (1 / 6), 1.5, 2.0])
def test_lj_two_particle_analytic(r):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    two_particle_system(r)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=3.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    st = hoomd.context.current.system.state
    f = np.asarray(st.net_force)
    pe = np.asarray(st.net_pe)
    v_ref, f_ref = lj_analytic(r)
    # particle 0 at -x feels force -f_ref * xhat (f_ref > 0 = repulsive)
    assert f[0, 0] == pytest.approx(-f_ref, rel=1e-3, abs=1e-4)
    assert f[1, 0] == pytest.approx(f_ref, rel=1e-3, abs=1e-4)
    assert pe.sum() == pytest.approx(v_ref, rel=1e-3, abs=1e-5)
    # Newton's third law exactly
    np.testing.assert_allclose(f[0], -f[1], rtol=1e-5, atol=1e-6)


def test_energy_shift_mode():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    r, rc = 1.5, 2.5
    two_particle_system(r)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=rc, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    lj.set_params(mode='shift')
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    pe = float(np.asarray(hoomd.context.current.system.state.net_pe).sum())
    v_r, _ = lj_analytic(r)
    v_rc, _ = lj_analytic(rc)
    assert pe == pytest.approx(v_r - v_rc, rel=1e-3)


def test_xplor_smoothing():
    """XPLOR mode: V unchanged below r_on, → 0 smoothly at r_cut."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    r, rc, ron = 2.4, 2.5, 2.0
    two_particle_system(r)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=rc, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0, r_on=ron)
    lj.set_params(mode='xplor')
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    pe = float(np.asarray(hoomd.context.current.system.state.net_pe).sum())
    v_r, _ = lj_analytic(r)
    rc2, r2, ron2 = rc * rc, r * r, ron * ron
    s = ((rc2 - r2) ** 2 * (rc2 + 2 * r2 - 3 * ron2)
         / (rc2 - ron2) ** 3)
    assert pe == pytest.approx(v_r * s, rel=1e-3)


def test_missing_coeff_raises():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    two_particle_system(1.2)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.nve(group=hoomd.group.all())
    with pytest.raises(RuntimeError, match="coefficients missing"):
        hoomd.run(1, quiet=True)


def test_per_pair_rcut_and_multi_type():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    snap = hoomd.data.make_snapshot(
        3, hoomd.data.boxdim(L=20.0), particle_types=['A', 'B'])
    snap.particles.position[0] = [0, 0, 0]
    snap.particles.position[1] = [1.5, 0, 0]
    snap.particles.position[2] = [0, 1.5, 0]
    snap.particles.typeid[:] = [0, 1, 1]
    hoomd.init.read_snapshot(snap)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    lj.pair_coeff.set('A', 'B', epsilon=2.0, sigma=1.0)
    # B-B interaction cut off entirely via r_cut=1.0 < 1.5*sqrt(2)
    lj.pair_coeff.set('B', 'B', epsilon=5.0, sigma=1.0, r_cut=1.0)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    pe = float(np.asarray(hoomd.context.current.system.state.net_pe).sum())
    v_ab, _ = lj_analytic(1.5, eps=2.0)
    assert pe == pytest.approx(2 * v_ab, rel=1e-3)


def test_gauss_analytic():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    r = 1.0
    two_particle_system(r)
    nl = md.nlist.cell()
    g = md.pair.gauss(r_cut=3.0, nlist=nl)
    g.pair_coeff.set('A', 'A', epsilon=2.0, sigma=0.5)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    pe = float(np.asarray(hoomd.context.current.system.state.net_pe).sum())
    assert pe == pytest.approx(2.0 * np.exp(-0.5 * r ** 2 / 0.25),
                               rel=1e-3)


def test_yukawa_analytic():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    r = 1.2
    two_particle_system(r)
    nl = md.nlist.cell()
    y = md.pair.yukawa(r_cut=3.0, nlist=nl)
    y.pair_coeff.set('A', 'A', epsilon=1.5, kappa=0.8)
    md.integrate.mode_standard(dt=0.0)
    md.integrate.nve(group=hoomd.group.all())
    hoomd.run(1, quiet=True)
    pe = float(np.asarray(hoomd.context.current.system.state.net_pe).sum())
    assert pe == pytest.approx(1.5 * np.exp(-0.8 * r) / r, rel=1e-3)
