"""HPMC box moves, SDF pressure, lattice field, patch energies."""

import numpy as np
import pytest


def hs(eta=0.2, n=5, seed=3, d=0.15):
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    N = n ** 3
    L = (np.pi / 6.0 * N / eta) ** (1.0 / 3.0)
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=L / n), n=n)
    mc = hpmc.integrate.sphere(seed=seed, d=d, nselect=2)
    mc.shape_param.set('A', diameter=1.0)
    return hoomd, mc, L, N


def test_boxmc_npt_density():
    """Hard spheres under boxmc at low betaP: volume responds (hard-sphere
    NPT); EOS sanity via Carnahan-Starling inverse."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd_mod, mc, L, N = hs(eta=0.2)
    bmc = hpmc.update.boxmc(mc, betaP=1.0, seed=5)
    bmc.ln_volume(delta=0.015, weight=1)
    vols = []
    hoomd_mod.run(80, quiet=True)
    system = hoomd_mod.context.current.system
    for _ in range(40):
        hoomd_mod.run(4, quiet=True)
        vols.append(float(system.state.box.volume()))
    eta = np.pi / 6 * N / np.mean(vols)
    # CS: betaP/rho = Z(eta); betaP=1 -> solve; at these conditions the
    # equilibrium packing is ~0.2-0.33; just require a physical window
    # and that the box actually moved
    assert 0.1 < eta < 0.45
    assert np.std(vols) > 0.0
    assert bmc.get_volume_acceptance() > 0.05


def test_sdf_pressure_carnahan_starling():
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    eta = 0.25
    hoomd_mod, mc, L, N = hs(eta=eta, n=6)
    s = hpmc.analyze.sdf(mc, filename=None, xmax=0.05, dx=0.005,
                         navg=1, period=4)
    hoomd_mod.run(100, quiet=True)   # equilibrate (sdf sampling along)
    s._hist[:] = 0
    s._nframes = 0
    hoomd_mod.run(150, quiet=True)
    betap = s.betaP()
    rho = N / L ** 3
    z_cs = (1 + eta + eta ** 2 - eta ** 3) / (1 - eta) ** 3
    assert betap / rho == pytest.approx(z_cs, rel=0.12)


def test_lattice_field_localizes():
    """Strong Einstein springs keep particles near lattice sites."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd_mod, mc, L, N = hs(eta=0.1, d=0.3)
    system = hoomd_mod.context.current.system
    ref = system.take_snapshot().particles.position.copy()
    lat = hpmc.field.lattice_field(mc, position=ref, k=100.0)
    hoomd_mod.run(60, quiet=True)
    snap = system.take_snapshot()
    d = snap.particles.position - ref
    d -= L * np.round(d / L)
    msd = (d ** 2).sum(axis=1).mean()
    # <r^2> = 3/(2k) per equipartition at kT=1
    assert msd == pytest.approx(3.0 / (2 * 100.0), rel=0.4)
    assert lat.get_energy() > 0


def test_frenkel_ladd_energy_protocol():
    """frenkel_ladd_energy (reference hpmc/field.py:824) builds the
    lattice_field + remove_drift pair; annealing ln_gamma rescales the
    spring and the measured MSD follows equipartition."""
    import math
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd_mod, mc, L, N = hs(eta=0.1, d=0.3)
    system = hoomd_mod.context.current.system
    snap = system.take_snapshot()
    ref = snap.particles.position.copy()
    q0 = np.tile([1.0, 0, 0, 0], (N, 1))
    fl = hpmc.field.frenkel_ladd_energy(
        mc=mc, ln_gamma=math.log(100.0), q_factor=10.0, r0=ref, q0=q0,
        drift_period=10)
    assert fl.trans_spring_const == pytest.approx(100.0)
    assert fl.rotat_spring_const == pytest.approx(1000.0)
    hoomd_mod.run(60, quiet=True)
    d = system.take_snapshot().particles.position - ref
    d -= L * np.round(d / L)
    msd = (d ** 2).sum(axis=1).mean()
    assert msd == pytest.approx(3.0 / (2 * 100.0), rel=0.4)
    assert fl.get_energy() > 0
    # anneal the spring down; particles spread further
    fl.set_params(ln_gamma=math.log(10.0))
    fl.reset_statistics()
    assert fl.trans_spring_const == pytest.approx(10.0)
    hoomd_mod.run(80, quiet=True)
    d = system.take_snapshot().particles.position - ref
    d -= L * np.round(d / L)
    msd2 = (d ** 2).sum(axis=1).mean()
    assert msd2 > msd * 2.0


def test_move_size_tuning_is_recompile_free():
    """d/a/move_ratio/seed ride a traced hdyn packed at chunk
    boundaries: set_params within the built stencil capacity must NOT
    rebuild the program (tuners fire it every few sweeps), while growing
    d past the built width MUST rebuild (stencil coverage)."""
    import hoomd_tpu as hoomd
    hoomd_mod, mc, L, N = hs(eta=0.42, d=0.4)
    hoomd_mod.run(4, quiet=True)
    system = hoomd_mod.context.current.system
    prog0 = system._program['run_chunk']

    def window_acceptance(sweeps):
        c = system._hpmc_counters
        a0, r0 = int(c['translate_accept']), int(c['translate_reject'])
        hoomd_mod.run(sweeps, quiet=True)
        c = system._hpmc_counters
        a = int(c['translate_accept']) - a0
        r = int(c['translate_reject']) - r0
        return a / (a + r)

    acc_big = window_acceptance(4)     # d=0.4 at eta=0.42: low

    mc.set_params(d=0.02)              # shrink: no rebuild
    acc_small = window_acceptance(4)
    assert system._program['run_chunk'] is prog0
    # the tiny moves must actually be in effect (traced hdyn delivered)
    assert acc_small > acc_big + 0.2, (acc_big, acc_small)

    mc.set_params(d=0.8)               # grow past built width: rebuild
    hoomd_mod.run(2, quiet=True)
    assert system._program['run_chunk'] is not prog0
