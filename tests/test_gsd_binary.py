"""On-disk GSD v1 binary-format interop (VERDICT item 9).

The files dump.gsd writes must follow the exact gsd.h layout
(reference hoomd/extern/gsd.h:46-88) so external tools (gsd-python,
VMD, OVITO) can open them.  The independent parser below implements
the format straight from the struct definitions — it shares no code
with hoomd_tpu.io.gsd_binary, so a layout bug in the writer cannot
self-cancel in the reader.
"""

import os
import struct

import numpy as np
import pytest

_DTYPES = {1: np.uint8, 2: np.uint16, 3: np.uint32, 4: np.uint64,
           5: np.int8, 6: np.int16, 7: np.int32, 8: np.int64,
           9: np.float32, 10: np.float64}


def parse_gsd_v1(path):
    """Minimal independent GSD v1 reader (gsd.h:46-88 layout)."""
    with open(path, 'rb') as f:
        raw = f.read()
    (magic, index_loc, index_n, name_loc, name_n, schema_ver, gsd_ver
     ) = struct.unpack_from('<QQQQQII', raw, 0)
    assert magic == 0x65DF65DF65DF65DF
    assert gsd_ver >> 16 == 1                     # v1 file
    app = raw[48:112].split(b'\0', 1)[0].decode()
    schema = raw[112:176].split(b'\0', 1)[0].decode()
    names = []
    for i in range(name_n):
        nm = raw[name_loc + 64 * i:name_loc + 64 * (i + 1)]
        nm = nm.split(b'\0', 1)[0].decode()
        if not nm:
            break
        names.append(nm)
    frames = {}
    prev = None
    for i in range(index_n):
        frame, N, loc, M, nid, typ, _fl = struct.unpack_from(
            '<QQqIHBB', raw, index_loc + 32 * i)
        if loc == 0:
            continue
        # gsd_find_chunk binary-searches: entries must be sorted
        if prev is not None:
            assert (frame, nid) > prev, "index not sorted by (frame,id)"
        prev = (frame, nid)
        dt = np.dtype(_DTYPES[typ])
        arr = np.frombuffer(raw, dt, count=N * max(M, 1), offset=loc)
        frames.setdefault(frame, {})[names[nid]] = (
            arr.reshape(N, M) if M > 1 else arr.copy())
    return app, schema, schema_ver, frames


def _write_traj(tmp_path, frames=3):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize('--notice-level=0')
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.5), n=4)
    system = hoomd.context.current.system
    snap = system.take_snapshot()
    rng = np.random.RandomState(2)
    v = rng.normal(0, 1.0, (snap.particles.N, 3))
    snap.particles.velocity[:] = v - v.mean(axis=0)
    system.restore_snapshot(snap)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nvt(group=hoomd.group.all(), kT=1.0, tau=0.5)
    fn = str(tmp_path / 'traj.gsd')
    hoomd.dump.gsd(fn, period=10, group=hoomd.group.all(), overwrite=True)
    hoomd.run(10 * frames, quiet=True)
    from hoomd_tpu.io.frames import flush_writes
    flush_writes()
    return fn


def test_gsd_file_layout_external_parse(tmp_path):
    fn = _write_traj(tmp_path, frames=3)
    app, schema, schema_ver, frames = parse_gsd_v1(fn)
    assert schema == 'hoomd'
    assert schema_ver >> 16 == 1
    assert len(frames) == 3
    f0 = frames[0]
    N = int(f0['particles/N'][0])
    assert N == 64
    assert f0['particles/position'].shape == (N, 3)
    assert f0['particles/position'].dtype == np.float32
    assert f0['configuration/step'].dtype == np.uint64
    assert f0['configuration/box'].dtype == np.float32
    assert list(f0['configuration/box'][:3]) == [6.0, 6.0, 6.0]
    # type names: null-padded uint8 rows (writeTypeMapping layout)
    t = f0['particles/types']
    assert t.dtype == np.uint8
    assert bytes(t[0]).split(b'\0', 1)[0] == b'A'
    # trajectory advances
    assert int(frames[2]['configuration/step'][0]) == 20
    assert not np.allclose(frames[2]['particles/position'],
                           f0['particles/position'])


def test_gsd_roundtrip_through_own_reader(tmp_path):
    fn = _write_traj(tmp_path, frames=2)
    import hoomd_tpu as hoomd
    snap0 = None
    from hoomd_tpu.io.frames import FrameReader
    r = FrameReader(fn)
    assert len(r) == 2
    snap, ts, _ = r.read(-1)
    assert ts == 10
    assert snap.particles.N == 64


def test_gsd_append_after_reopen(tmp_path):
    """Append mode continues an existing file — frame indices and the
    in-place index block survive the reopen."""
    from hoomd_tpu.io.gsd_binary import GSDFile
    fn = str(tmp_path / 'x.gsd')
    with GSDFile(fn, 'w') as g:
        g.write_chunk('data/a', np.arange(4, dtype=np.float32))
        g.end_frame()
    with GSDFile(fn, 'a') as g:
        g.write_chunk('data/a', np.arange(4, 8, dtype=np.float32))
        g.write_chunk('data/b', np.ones((2, 3), dtype=np.int32))
        g.end_frame()
    _, _, _, frames = parse_gsd_v1(fn)
    assert len(frames) == 2
    np.testing.assert_array_equal(frames[1]['data/a'],
                                  [4.0, 5.0, 6.0, 7.0])
    assert frames[1]['data/b'].shape == (2, 3)


def test_gsd_index_block_relocation(tmp_path):
    """>128 index entries force the gsd_expand_index-style relocation;
    every entry must survive."""
    from hoomd_tpu.io.gsd_binary import GSDFile
    fn = str(tmp_path / 'big.gsd')
    with GSDFile(fn, 'w') as g:
        for fr in range(70):
            g.write_chunk('c/a', np.full(3, fr, np.int64))
            g.write_chunk('c/b', np.full(2, -fr, np.int64))
            g.end_frame()
    _, _, _, frames = parse_gsd_v1(fn)
    assert len(frames) == 70
    np.testing.assert_array_equal(frames[69]['c/a'], [69] * 3)
    np.testing.assert_array_equal(frames[69]['c/b'], [-69] * 2)


def test_restart_file_is_gsd(tmp_path):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize('--notice-level=0')
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.5), n=4)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.002)
    md.integrate.nvt(group=hoomd.group.all(), kT=1.0, tau=0.5)
    hoomd.run(20, quiet=True)
    fn = str(tmp_path / 'restart.gsd')
    d = hoomd.dump.gsd(fn, period=None, group=hoomd.group.all(),
                       overwrite=True)
    d.write_restart()
    app, schema, _, frames = parse_gsd_v1(fn)
    assert schema == 'hoomd'
    assert len(frames) == 1
    # state chunks carried for exact resume (thermostat xi/eta)
    assert any(k.startswith('state/') for k in frames[0])
