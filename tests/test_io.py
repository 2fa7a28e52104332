"""Checkpoint/restore and trajectory tests (reference GSD round-trip
semantics, hoomd/test-py/test_dump_gsd.py)."""

import os

import numpy as np
import pytest


def small_md(tmp=None, kT=1.0):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.8), n=4)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.langevin(group=hoomd.group.all(), kT=kT, seed=1)
    return hoomd


def test_frame_roundtrip(tmp_path):
    import hoomd_tpu as hoomd
    hoomd_mod = small_md()
    f = str(tmp_path / "traj.htpf")
    d = hoomd_mod.dump.gsd(f, period=10, overwrite=True)
    hoomd_mod.run(35, quiet=True)
    from hoomd_tpu.io.frames import FrameReader
    r = FrameReader(f)
    assert len(r) == 4  # steps 0,10,20,30
    snap, ts, _ = r.read(-1)
    assert ts == 30
    assert snap.particles.N == 64
    snap0, ts0, _ = r.read(0)
    assert ts0 == 0


def test_restart_resume(tmp_path):
    """Write restart, re-init from it, verify state carries over
    (reference restartable-jobs.rst idiom)."""
    import hoomd_tpu as hoomd
    hoomd_mod = small_md()
    hoomd_mod.run(25, quiet=True)
    f = str(tmp_path / "restart.htpf")
    d = hoomd_mod.dump.gsd(f, period=10, overwrite=True)
    d.write_restart()
    snap_before = hoomd.context.current.system.take_snapshot()
    ts_before = hoomd.context.current.system.timestep

    hoomd.context.initialize('--notice-level=0')
    hoomd.init.read_gsd(str(tmp_path / "missing.htpf"), restart=f)
    sys2 = hoomd.context.current.system
    assert sys2.timestep == ts_before
    snap_after = sys2.take_snapshot()
    np.testing.assert_allclose(snap_after.particles.position,
                               snap_before.particles.position, atol=1e-6)
    np.testing.assert_allclose(snap_after.particles.velocity,
                               snap_before.particles.velocity, atol=1e-6)


def test_thermostat_state_persists(tmp_path):
    """NVT xi/eta are checkpointed and restorable
    (reference IntegratorVariables via GSD, integrate.py restore_state)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.8), n=3)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.005)
    nvt = md.integrate.nvt(group=hoomd.group.all(), kT=1.0, tau=0.5)
    hoomd.run(50, quiet=True)
    sys1 = hoomd.context.current.system
    xi_before = float(sys1._method_aux_by_obj[nvt]['xi'])
    assert xi_before != 0.0
    f = str(tmp_path / "rs.htpf")
    d = hoomd.dump.gsd(f, period=10, overwrite=True)
    d.write_restart()

    hoomd.context.initialize('--notice-level=0')
    hoomd.init.read_gsd(f)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.005)
    nvt2 = md.integrate.nvt(group=hoomd.group.all(), kT=1.0, tau=0.5)
    nvt2.restore_state()
    hoomd.run(1, quiet=True)
    sys2 = hoomd.context.current.system
    xi_after = float(sys2._method_aux_by_obj[nvt2]['xi'])
    assert xi_after != 0.0
    assert abs(xi_after - xi_before) < 0.1  # evolved by 1 step only


def test_dcd_writer(tmp_path):
    import struct
    hoomd_mod = small_md()
    f = str(tmp_path / "traj.dcd")
    hoomd_mod.dump.dcd(f, period=10, overwrite=True)
    hoomd_mod.run(30, quiet=True)
    with open(f, 'rb') as fh:
        data = fh.read()
    # header record: length 84, magic CORD, nframes patched to 3
    assert struct.unpack('<i', data[:4])[0] == 84
    assert data[4:8] == b'CORD'
    assert struct.unpack('<i', data[8:12])[0] == 3


def test_log_analyzer(tmp_path):
    import hoomd_tpu as hoomd
    hoomd_mod = small_md()
    f = str(tmp_path / "log.tsv")
    lg = hoomd_mod.analyze.log(
        filename=f, quantities=['potential_energy', 'temperature',
                                'pressure', 'pair_lj_energy'],
        period=10, overwrite=True)
    hoomd_mod.run(30, quiet=True)
    rows = open(f).read().strip().split('\n')
    assert rows[0].startswith('timestep')
    assert len(rows) == 4  # header + steps 0,10,20
    # query API
    assert isinstance(lg.query('temperature'), float)
    # pair energy must equal total PE (only one force present)
    pe = lg.query('potential_energy')
    lj_e = lg.query('pair_lj_energy')
    assert pe == pytest.approx(lj_e, rel=1e-4)


def test_getar_zip_roundtrip(tmp_path):
    """dump.getar writes a real zip in the libgetar path schema;
    init.restore_getar reads the newest frame back."""
    import zipfile
    import hoomd_tpu as hoomd
    from hoomd_tpu import md

    hoomd.context.initialize("--notice-level=0")
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.8), n=3)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nve(group=hoomd.group.all())
    fn = str(tmp_path / "dump.zip")
    hoomd.dump.getar.simple(fn, period=5)
    hoomd.run(11, quiet=True)
    snap0 = hoomd.context.current.system.take_snapshot()

    with zipfile.ZipFile(fn) as z:
        names = z.namelist()
    assert 'type_names.json' in names
    assert any(n.startswith('frames/10/position.f32.ind')
               for n in names)

    hoomd.context.initialize("--notice-level=0")
    hoomd.init.restore_getar(fn)
    system = hoomd.context.current.system
    assert system.timestep == 10
    snap1 = system.take_snapshot()
    np.testing.assert_allclose(
        np.asarray(snap1.particles.position),
        np.asarray(snap0.particles.position), atol=2e-2)


def test_variable_period_callback():
    """Variable-period specification (reference System.h:210-232
    shouldExecute + sphinx-doc/varperiod.rst): period=lambda n: 10**n
    fires at creation, then at created + 10, 100, 1000, ..."""
    hoomd_mod = small_md()
    fired = []
    hoomd_mod.analyze.callback(lambda ts: fired.append(ts),
                               period=lambda n: 10 ** n)
    hoomd_mod.run(250, quiet=True)
    assert fired == [0, 10, 100]

    # a second run continues the same schedule (next fire at 1000)
    hoomd_mod.run(800, quiet=True)
    assert fired == [0, 10, 100, 1000]


def test_variable_period_offset_start():
    """Created mid-run history: offsets are relative to the creation
    step, matching the reference's m_created_tstep bookkeeping."""
    hoomd_mod = small_md()
    hoomd_mod.run(25, quiet=True)
    fired = []
    hoomd_mod.analyze.callback(lambda ts: fired.append(ts),
                               period=lambda n: n * n)
    hoomd_mod.run(20, quiet=True)
    # created at 25: fires at 25, then 25+1, 25+4, 25+9, 25+16
    assert fired == [25, 26, 29, 34, 41]


def test_variable_period_survives_disable_enable():
    """An op disabled across its scheduled fire step must resume (not
    wedge) when re-enabled — regression for the exact-match schedule."""
    hoomd_mod = small_md()
    fired = []
    cb = hoomd_mod.analyze.callback(lambda ts: fired.append(ts),
                                    period=lambda n: 10 * n)
    hoomd_mod.run(5, quiet=True)       # fires at 0; next at 10
    cb.disable()
    hoomd_mod.run(10, quiet=True)      # skips the step-10 fire
    cb.enable()
    hoomd_mod.run(30, quiet=True)      # must fire again, catching up
    assert fired[0] == 0
    assert len(fired) >= 2             # resumed after re-enable
    assert all(b > a for a, b in zip(fired, fired[1:]))
