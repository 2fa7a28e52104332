"""System initialization (reference hoomd/init.py:32-384)."""

from __future__ import annotations

import os

import numpy as np

from . import context, data
from .io.frames import FrameReader
from .snapshot import Snapshot
from .system import System


def is_initialized():
    return (context.current is not None
            and context.current.system is not None)


def _require_context():
    if context.current is None:
        context.initialize('')


def _finish_init(snap):
    """Create the System and perform common init tasks
    (reference init.py:341 _perform_common_init_tasks: default sorter)."""
    _require_context()
    if context.current.system is not None:
        raise RuntimeError("system already initialized "
                           "(call context.initialize() to reset)")
    sys_ = System(snap)
    context.current.system = sys_
    from . import update
    context.current.sorter = update.sort(period=300)
    return data.system_data(sys_)


def read_snapshot(snapshot):
    """Initialize from a snapshot (reference init.read_snapshot,
    init.py:212)."""
    return _finish_init(snapshot)


def create_lattice(unitcell, n):
    """Replicate a unit cell n (or (nx,ny,nz)) times
    (reference init.create_lattice, init.py:32)."""
    snap = unitcell.get_snapshot()
    if isinstance(n, (list, tuple)):
        nx, ny, nz = (list(n) + [1, 1, 1])[:3]
    else:
        nx = ny = nz = int(n)
    if snap.box.dimensions == 2:
        if isinstance(n, (list, tuple)):
            nz = 1
        else:
            nz = 1
    snap = snap.replicate(nx, ny, nz)
    return _finish_init(snap)


def read_gsd(filename, restart=None, frame=-1, time_step=None):
    """Initialize from a dumped frame file, preferring the restart file if
    it exists — the restartable-job idiom (reference init.read_gsd,
    init.py:256-313)."""
    fn = filename
    if restart is not None and os.path.exists(restart):
        fn = restart
        frame = -1
    reader = FrameReader(fn)
    snap, ts, op_state = reader.read(frame)
    sysdata = _finish_init(snap)
    system = context.current.system
    if time_step is not None:
        ts = int(time_step)
    import jax.numpy as jnp
    system.state = system.state.replace(
        timestep=jnp.asarray(ts, dtype=system.state.timestep.dtype))
    # stash per-method restart state for restore_state()
    restored = {}
    for k, v in op_state.items():
        method, _, var = k.partition('/')
        restored.setdefault(method, {})[var] = jnp.asarray(v)
    system._restored_method_state = restored
    return sysdata


# reference deprecated initializers kept for script compatibility ----------

def create_random(N, phi_p=None, name='A', min_dist=0.7, box=None, seed=1,
                  dimensions=3):
    """Random gas initializer (reference deprecated.init.create_random):
    rejection-free random placement with a minimum-distance relaxation."""
    from .snapshot import BoxSnapshot
    rng = np.random.RandomState(seed)
    if box is None:
        if phi_p is None:
            raise ValueError("give either phi_p or box")
        if dimensions == 3:
            L = (N * np.pi / 6.0 / phi_p) ** (1.0 / 3.0)
        else:
            L = (N * np.pi / 4.0 / phi_p) ** 0.5
        box = BoxSnapshot(L, L, L if dimensions == 3 else 1.0,
                          dimensions=dimensions)
    snap = Snapshot(N, box, particle_types=[name])
    L = np.array([box.Lx, box.Ly, box.Lz])
    pos = (rng.rand(N, 3) - 0.5) * L
    if dimensions == 2:
        pos[:, 2] = 0.0
    snap.particles.position[:] = pos
    return _finish_init(snap)


def restore_getar(filename, modes=None):
    """Initialize from the newest frame of a getar zip archive written
    by ``dump.getar`` (reference init.restore_getar,
    GetarInitializer.h)."""
    import json
    import zipfile

    _require_context()
    with zipfile.ZipFile(filename, 'r') as z:
        names = z.namelist()
        frames = sorted({int(n.split('/')[1]) for n in names
                         if n.startswith('frames/')})
        if not frames:
            raise RuntimeError(f"restore_getar: no frames in {filename}")
        ts = frames[-1]
        pre = f'frames/{ts}/'

        def arr(rec, dt):
            return np.frombuffer(z.read(pre + rec), dtype=dt)

        types = json.loads(z.read('type_names.json'))
        box = np.frombuffer(z.read(pre + 'box.f32.uni'), '<f4')
        pos = arr('position.f32.ind', '<f4').reshape(-1, 3)
        N = len(pos)
        snap = data.make_snapshot(
            N, data.boxdim(Lx=float(box[0]), Ly=float(box[1]),
                           Lz=float(box[2]), xy=float(box[3]),
                           xz=float(box[4]), yz=float(box[5])),
            particle_types=list(types))
        snap.particles.position[:] = pos
        snap.particles.velocity[:] = \
            arr('velocity.f32.ind', '<f4').reshape(-1, 3)
        snap.particles.image[:] = \
            arr('image.i32.ind', '<i4').reshape(-1, 3)
        snap.particles.typeid[:] = arr('type.u32.ind', '<u4')
        snap.particles.mass[:] = arr('mass.f32.ind', '<f4')
        snap.particles.charge[:] = arr('charge.f32.ind', '<f4')
        snap.particles.diameter[:] = arr('diameter.f32.ind', '<f4')
        snap.particles.orientation[:] = \
            arr('orientation.f32.ind', '<f4').reshape(-1, 4)
    sysdata = _finish_init(snap)
    sys_ = context.current.system
    sys_.state = sys_.state.replace(timestep=np.int32(ts))
    return sysdata
