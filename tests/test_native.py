"""Native C++ components: Hilbert indexing, async frame writer."""

import numpy as np
import pytest


def test_native_builds():
    from hoomd_tpu.native import get_lib
    lib = get_lib()
    assert lib is not None, "native library failed to build"


def test_hilbert_locality():
    """Hilbert order must beat random order on neighbor locality: mean
    |index difference| of near-space pairs is small."""
    from hoomd_tpu.native import hilbert3
    rng = np.random.RandomState(0)
    f = rng.rand(2000, 3)
    h = hilbert3(f, bits=8)
    assert h is not None
    order = np.argsort(h)
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    # pick random close pairs; their ranks should be closer than random
    d = np.linalg.norm(f[None, :100] - f[:100, None], axis=-1)
    np.fill_diagonal(d, 1e9)
    i, j = np.unravel_index(np.argsort(d, axis=None)[:50], d.shape)
    close_rank_dist = np.abs(rank[i] - rank[j]).mean()
    rand_rank_dist = len(f) / 3.0
    assert close_rank_dist < rand_rank_dist * 0.5


def test_hilbert_is_permutation_complete():
    from hoomd_tpu.native import hilbert3
    # grid corners map to distinct indices
    f = np.array([[x, y, z] for x in (0.1, 0.9) for y in (0.1, 0.9)
                  for z in (0.1, 0.9)])
    h = hilbert3(f, bits=4)
    assert len(set(h.tolist())) == 8


def test_async_writer_roundtrip(tmp_path):
    from hoomd_tpu.native import AsyncWriter
    from hoomd_tpu.io.frames import HTPF_MAGIC as MAGIC
    w = AsyncWriter(MAGIC)
    f = str(tmp_path / "x.bin")
    blobs = [bytes([i]) * (100 + i) for i in range(20)]
    w.enqueue(f, blobs[0], True)
    for b in blobs[1:]:
        w.enqueue(f, b, False)
    w.flush()
    import struct
    with open(f, 'rb') as fh:
        assert fh.read(len(MAGIC)) == MAGIC
        for b in blobs:
            (n,) = struct.unpack('<Q', fh.read(8))
            assert fh.read(n) == b
    w.close()


def test_dump_uses_async_writer(tmp_path):
    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    from hoomd_tpu.io.frames import FrameReader
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.5), n=3)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.0, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.nve(group=hoomd.group.all())
    f = str(tmp_path / "t.htpf")
    hoomd.dump.gsd(f, period=10, overwrite=True)
    hoomd.run(50, quiet=True)
    r = FrameReader(f)     # flushes pending writes first
    assert len(r) == 5
    snap, ts, _ = r.read(-1)
    assert ts == 40
