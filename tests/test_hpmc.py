"""HPMC hard-sphere validation (reference hpmc/validation/sphere_eos.py:
pressure EOS vs literature; here via the contact value of g(r) against
Carnahan-Starling, plus invariant checks: no overlaps ever, detailed-balance
symptom checks (acceptance in (0,1)), free volume)."""

import numpy as np
import pytest


def hs_fluid(eta=0.2, n=6, seed=7):
    """Hard spheres at packing fraction eta on a dilute sc lattice."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    N = n ** 3
    # eta = (pi/6) N sigma^3 / V  ->  L from eta
    L = (np.pi / 6.0 * N / eta) ** (1.0 / 3.0)
    a = L / n
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=n)
    mc = hpmc.integrate.sphere(seed=seed, d=0.15, nselect=2)
    mc.shape_param.set('A', diameter=1.0)
    return hoomd, mc, L, N


def min_pair_distance(system):
    snap = system.take_snapshot()
    p = snap.particles.position
    L = snap.box.Lx
    dr = p[None] - p[:, None]
    dr -= L * np.round(dr / L)
    r = np.linalg.norm(dr, axis=-1) + np.eye(len(p)) * 1e9
    return r.min(), r


def test_no_overlaps_ever():
    import hoomd_tpu as hoomd
    hoomd_mod, mc, L, N = hs_fluid(eta=0.35)
    for _ in range(5):
        hoomd_mod.run(20, quiet=True)
        dmin, _ = min_pair_distance(hoomd_mod.context.current.system)
        assert dmin >= 1.0 - 1e-5, f"overlap: min dist {dmin}"


def test_acceptance_reasonable_and_moves_happen():
    import hoomd_tpu as hoomd
    hoomd_mod, mc, L, N = hs_fluid(eta=0.25)
    snap0 = hoomd_mod.context.current.system.take_snapshot()
    hoomd_mod.run(50, quiet=True)
    snap1 = hoomd_mod.context.current.system.take_snapshot()
    acc = mc.get_translate_acceptance()
    assert 0.05 < acc < 0.999
    moved = np.abs(snap1.particles.position
                   - snap0.particles.position).max()
    assert moved > 0.1


def test_contact_g_carnahan_starling():
    """g(sigma+) vs Carnahan-Starling (1-eta/2)/(1-eta)^3 at eta=0.3.
    This is the pressure EOS in disguise: Z = 1 + 4 eta g(sigma)."""
    import hoomd_tpu as hoomd
    eta = 0.3
    hoomd_mod, mc, L, N = hs_fluid(eta=eta, n=6)
    system = hoomd_mod.context.current.system
    hoomd_mod.run(120, quiet=True)   # equilibrate
    shell_lo, shell_hi = 1.0, 1.08
    counts = 0
    samples = 0
    for _ in range(30):
        hoomd_mod.run(4, quiet=True)
        _, r = min_pair_distance(system)
        counts += np.sum((r >= shell_lo) & (r < shell_hi)) / 2
        samples += 1
    rho = N / L ** 3
    r_mid = 0.5 * (shell_lo + shell_hi)
    shell_vol = 4.0 / 3.0 * np.pi * (shell_hi ** 3 - shell_lo ** 3)
    g_shell = counts / samples / (0.5 * N * rho * shell_vol)
    g_cs = (1 - eta / 2) / (1 - eta) ** 3
    # the [1.0, 1.08] shell average sits systematically ~10-15% below
    # the contact value (g decays steeply off contact) and seed spread
    # at this run length is ~±0.1 (measured 2.05-2.34 over 8 seeds on
    # both the gather and dense sweeps); 0.2 covers bias + noise while
    # still catching an ideal-gas g=1 or a double-counting g~5
    assert g_shell == pytest.approx(g_cs, rel=0.2)


def test_free_volume_dilute_limit():
    """At low density the free volume for a point tester ~ V (1 - eta)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd_mod, mc, L, N = hs_fluid(eta=0.1)
    fv = hpmc.compute.free_volume(mc, seed=3, nsample=20000)
    hoomd_mod.run(10, quiet=True)
    val = fv.value
    V = L ** 3
    # point tester excluded from spheres of radius 0.5: excluded volume
    # fraction ~ eta (overlaps rare at eta=0.1)
    assert val / V == pytest.approx(1.0 - 0.1, abs=0.02)


def test_tuner_moves_acceptance_toward_target():
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd_mod, mc, L, N = hs_fluid(eta=0.35, seed=3)
    mc.set_params(d=0.02)   # tiny moves -> acceptance near 1
    tuner = hpmc.util.tune(mc, tunables=['d'], target=0.3)
    for _ in range(6):
        hoomd_mod.run(15, quiet=True)
        tuner.update()
    hoomd_mod.run(15, quiet=True)
    acc = mc.get_translate_acceptance()
    assert acc == pytest.approx(0.3, abs=0.15)
    assert mc._default_d > 0.05


def test_hpmc_checkpoint_roundtrip(tmp_path):
    import hoomd_tpu as hoomd
    hoomd_mod, mc, L, N = hs_fluid(eta=0.3)
    hoomd_mod.run(20, quiet=True)
    system = hoomd_mod.context.current.system
    f = str(tmp_path / "mc.htpf")
    d = hoomd_mod.dump.gsd(f, period=10, overwrite=True)
    d.write_restart()
    pos_before = system.take_snapshot().particles.position.copy()

    import hoomd_tpu.context
    hoomd_mod.context.initialize('--notice-level=0')
    hoomd_mod.init.read_gsd(f)
    from hoomd_tpu import hpmc as hp
    mc2 = hp.integrate.sphere(seed=42, d=0.15)
    mc2.shape_param.set('A', diameter=1.0)
    sys2 = hoomd_mod.context.current.system
    np.testing.assert_allclose(sys2.take_snapshot().particles.position,
                               pos_before, atol=1e-6)
    dmin, _ = min_pair_distance(sys2)
    assert dmin >= 1.0 - 1e-5
    hoomd_mod.run(5, quiet=True)


def test_dense_sweep_path_invariants(monkeypatch):
    """The opt-in dense (roll-based) checkerboard sweep keeps the hard
    constraint and makes moves — regression cover for the non-default
    path after the TPU default flipped to the gather sweep."""
    monkeypatch.setenv('HOOMD_TPU_HPMC_DENSE', 'on')
    import hoomd_tpu as hoomd
    hoomd_mod, mc, L, N = hs_fluid(eta=0.3, n=6)
    system = hoomd_mod.context.current.system
    snap0 = system.take_snapshot()
    hoomd_mod.run(40, quiet=True)
    assert system._program.get('dense'), "dense sweep was not selected"
    dmin, _ = min_pair_distance(system)
    assert dmin >= 1.0 - 1e-5, f"overlap on dense sweep: {dmin}"
    acc = mc.get_translate_acceptance()
    assert 0.02 < acc < 0.999
    snap1 = system.take_snapshot()
    moved = np.abs(snap1.particles.position
                   - snap0.particles.position).max()
    assert moved > 0.05
