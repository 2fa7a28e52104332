"""Chunked binary frame store — the checkpoint/trajectory container.

Fills the role of the reference's GSD format (hoomd/GSDDumpWriter.cc:160,
GSDReader.h:36-96, hoomd/extern/gsd.c): append-only frames of named chunks
(box, positions, topology, per-operation restart state), restart writing,
negative frame indexing.  The binary layout is our own (length-prefixed
zlib-compressed numpy archives) rather than GSD's index-block layout — this
build has no external GSD consumers; the *capability* (periodic frames +
restart + per-op state + api-compatible reader) is what carries over.

Chunk names follow the GSD HOOMD schema (configuration/step, particles/N,
particles/position, ...) so migrating to the on-disk GSD layout later is a
serialization swap, not an API change.
"""

from __future__ import annotations

import io
import os
import struct
import zlib

import numpy as np

MAGIC = b"HTPF0001"

# one background writer per process (native C++ thread; synchronous
# fallback when no compiler is available)
_async_writer = None


def _writer():
    global _async_writer
    if _async_writer is None:
        from ..native import AsyncWriter
        _async_writer = AsyncWriter(MAGIC)
    return _async_writer


def flush_writes():
    """Block until queued frame writes hit the disk."""
    if _async_writer is not None:
        _async_writer.flush()


def _frame_to_chunks(snap, timestep, op_state=None):
    """Snapshot -> flat dict of numpy arrays using GSD-schema chunk names."""
    c = {}
    c['configuration/step'] = np.array([timestep], dtype=np.int64)
    c['configuration/dimensions'] = np.array([snap.box.dimensions],
                                             dtype=np.int32)
    c['configuration/box'] = np.array(
        [snap.box.Lx, snap.box.Ly, snap.box.Lz,
         snap.box.xy, snap.box.xz, snap.box.yz], dtype=np.float64)
    p = snap.particles
    c['particles/N'] = np.array([p.N], dtype=np.int64)
    c['particles/types'] = np.array(p.types, dtype='U32')
    for name in ('position', 'velocity', 'acceleration', 'typeid', 'mass',
                 'charge', 'diameter', 'image', 'body', 'orientation',
                 'angmom', 'moment_inertia'):
        c[f'particles/{name}'] = getattr(p, name)
    for kind in ('bonds', 'angles', 'dihedrals', 'impropers', 'constraints',
                 'pairs'):
        t = getattr(snap, kind)
        c[f'{kind}/N'] = np.array([t.N], dtype=np.int64)
        c[f'{kind}/types'] = np.array(t.types, dtype='U32')
        c[f'{kind}/typeid'] = t.typeid
        c[f'{kind}/group'] = t.group
        c[f'{kind}/value'] = t.value
    if op_state:
        for k, v in op_state.items():
            c[f'state/{k}'] = np.asarray(v)
    return c


def _chunks_to_frame(c):
    from ..snapshot import BoxSnapshot, Snapshot
    box = c['configuration/box']
    bs = BoxSnapshot(box[0], box[1], box[2], box[3], box[4], box[5],
                     dimensions=int(c['configuration/dimensions'][0]))
    N = int(c['particles/N'][0])
    snap = Snapshot(N, bs, particle_types=list(c['particles/types']))
    p = snap.particles
    for name in ('position', 'velocity', 'acceleration', 'typeid', 'mass',
                 'charge', 'diameter', 'image', 'body', 'orientation',
                 'angmom', 'moment_inertia'):
        getattr(p, name)[:] = c[f'particles/{name}']
    for kind in ('bonds', 'angles', 'dihedrals', 'impropers', 'constraints',
                 'pairs'):
        t = getattr(snap, kind)
        t.types = list(c[f'{kind}/types'])
        t.resize(int(c[f'{kind}/N'][0]))
        if t.N:
            t.typeid[:] = c[f'{kind}/typeid']
            t.group[:] = c[f'{kind}/group']
            t.value[:] = c[f'{kind}/value']
    op_state = {k[len('state/'):]: v for k, v in c.items()
                if k.startswith('state/')}
    timestep = int(c['configuration/step'][0])
    return snap, timestep, op_state


def _encode(chunks):
    buf = io.BytesIO()
    np.savez(buf, **chunks)
    return zlib.compress(buf.getvalue(), level=1)


def _decode(blob):
    buf = io.BytesIO(zlib.decompress(blob))
    with np.load(buf, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


class FrameWriter:
    """Append frames to a file; ``truncate`` keeps only the newest frame
    (the reference dump.gsd truncate flag)."""

    def __init__(self, filename, overwrite=False, truncate=False):
        self.filename = filename
        self.truncate = truncate
        exists = os.path.exists(filename)
        if overwrite or not exists:
            with open(filename, 'wb') as f:
                f.write(MAGIC)
        else:
            with open(filename, 'rb') as f:
                if f.read(8) != MAGIC:
                    raise IOError(f"{filename}: not a hoomd_tpu frame file")

    def append(self, snap, timestep, op_state=None):
        blob = _encode(_frame_to_chunks(snap, timestep, op_state))
        # hand off to the native background writer: the device step loop
        # never stalls on disk I/O
        _writer().enqueue(self.filename, blob, self.truncate)


def write_single_frame(filename, snap, timestep, op_state=None):
    """Atomic single-frame write (restart files, dump.gsd write_restart)."""
    flush_writes()   # don't let a queued periodic frame clobber us later
    tmp = filename + '.tmp'
    blob = _encode(_frame_to_chunks(snap, timestep, op_state))
    with open(tmp, 'wb') as f:
        f.write(MAGIC)
        f.write(struct.pack('<Q', len(blob)))
        f.write(blob)
    os.replace(tmp, filename)


class FrameReader:
    """Random access over the frames of a file (GSDReader analog)."""

    def __init__(self, filename):
        flush_writes()
        self.filename = filename
        self._offsets = []
        with open(filename, 'rb') as f:
            if f.read(8) != MAGIC:
                raise IOError(f"{filename}: not a hoomd_tpu frame file")
            while True:
                head = f.read(8)
                if len(head) < 8:
                    break
                (n,) = struct.unpack('<Q', head)
                self._offsets.append((f.tell(), n))
                f.seek(n, 1)

    def __len__(self):
        return len(self._offsets)

    def read(self, frame=-1):
        """Returns (snapshot, timestep, op_state); negative frames index
        from the end (reference GSD negative frame support)."""
        off, n = self._offsets[frame]
        with open(self.filename, 'rb') as f:
            f.seek(off)
            blob = f.read(n)
        return _chunks_to_frame(_decode(blob))
