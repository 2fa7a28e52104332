"""Core updaters (reference hoomd/update.py): particle sorting, box resize,
load balancing."""

from __future__ import annotations

import numpy as np

from . import context, variant
from .operation import Updater


def _sys():
    return context.current.system


class sort(Updater):
    """Spatial re-sort of particle storage for memory locality — the
    SFCPackUpdater analog (reference hoomd/SFCPackUpdater.h:38-84,
    update.py:258).  Reorders slots along a 3D Hilbert curve (native C++
    encoder; Morton fallback); the neighbor list is invalidated and rebuilt
    on the next step.  Default period 300 matches the reference GPU
    default."""

    def __init__(self, period=300, phase=0):
        Updater.__init__(self, period, phase)
        _sys().register_updater(self)

    def set_params(self, grid=None):
        pass  # grid resolution is chosen automatically

    def update(self, system, timestep):
        import jax.numpy as jnp
        st = system.state
        f = np.asarray(st.box.make_fraction(st.pos))
        f = f - np.floor(f)
        from .native import hilbert3
        code = hilbert3(f, bits=6)
        if code is None:
            # Morton fallback when the native library is unavailable
            k = 5
            c = np.clip((f * (1 << k)).astype(np.int64), 0, (1 << k) - 1)

            def _spread(x):
                x = (x | (x << 16)) & 0x0000FFFF0000FFFF
                x = (x | (x << 8)) & 0x00FF00FF00FF00FF
                x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0F
                x = (x | (x << 2)) & 0x3333333333333333
                x = (x | (x << 1)) & 0x5555555555555555
                return x
            code = (_spread(c[:, 0]) | (_spread(c[:, 1]) << 1)
                    | (_spread(c[:, 2]) << 2))
        order = jnp.asarray(np.argsort(code, kind='stable'))
        system.state = st.permute(order)
        system.reset_nlist()


class box_resize(Updater):
    """Rescale the box (and particles) over time via variants
    (reference hoomd/BoxResizeUpdater.h, update.py box_resize)."""

    def __init__(self, Lx=None, Ly=None, Lz=None, xy=None, xz=None, yz=None,
                 period=1, L=None, phase=0, scale_particles=True):
        Updater.__init__(self, period, phase)
        if L is not None:
            Lx = Ly = Lz = L
        self.Lx = variant.as_variant(Lx) if Lx is not None else None
        self.Ly = variant.as_variant(Ly) if Ly is not None else None
        self.Lz = variant.as_variant(Lz) if Lz is not None else None
        self.xy = variant.as_variant(xy) if xy is not None else None
        self.xz = variant.as_variant(xz) if xz is not None else None
        self.yz = variant.as_variant(yz) if yz is not None else None
        self.scale_particles = scale_particles
        _sys().register_updater(self)

    def update(self, system, timestep):
        import jax.numpy as jnp
        st = system.state
        box = st.box
        L = np.asarray(box.L, dtype=np.float64).copy()
        tilt = np.asarray(box.tilt, dtype=np.float64).copy()
        newL = L.copy()
        for i, v in enumerate((self.Lx, self.Ly, self.Lz)):
            if v is not None:
                newL[i] = v.value(timestep)
        for i, v in enumerate((self.xy, self.xz, self.yz)):
            if v is not None:
                tilt[i] = v.value(timestep)
        dt = st.pos.dtype
        new_box = box.replace(L=jnp.asarray(newL, dtype=dt),
                              tilt=jnp.asarray(tilt, dtype=dt))
        pos = st.pos
        if self.scale_particles:
            frac = box.make_fraction(pos)
            pos = new_box.from_fraction(frac)
        pos, image = new_box.wrap(pos, st.image)
        system.state = st.replace(pos=pos, image=image, box=new_box)


class balance(Updater):
    """Dynamic domain load balancing (reference hoomd/LoadBalancer.h:46-144).

    Two regimes:
      * 1-D atom decomposition (--nrank without an explicit grid): load
        is balanced by construction (uniform slot sharding) — no-op;
      * spatial DD (--nx/--ny/--nz, parallel/fastdd.py): iterates the
        cell-plane cut positions toward equal particle counts per
        shard, the reference's adjustable DomainDecomposition slab
        fractions (hoomd/DomainDecomposition.h:164-175).  The cuts are
        a traced operand of the step program, so rebalancing costs one
        carry re-bin and zero recompiles."""

    def __init__(self, x=True, y=True, z=True, tolerance=1.02,
                 maxiter=1, period=1000, phase=0):
        Updater.__init__(self, None, phase)
        self.enable_axes = (z, y, x)        # (z, y, x) cut order
        self.tolerance = float(tolerance)
        self.maxiter = max(int(maxiter), 1)
        _sys().register_updater(self)

    def update(self, system, timestep):
        fast = (system._program or {}).get('fast') \
            if system._program else None
        if not fast or fast.get('flavor') != 'dd':
            return
        from .parallel.fastdd import balance_cuts, shard_imbalance
        dd_shape = fast['dd_shape']
        grid = fast['grid']
        box = system.state.box
        frac = np.asarray(box.make_fraction(system.state.pos))
        frac = frac - np.floor(frac)
        cuts = getattr(system, '_dd_cuts', None)
        if cuts is None:
            cuts = tuple(
                np.linspace(0.0, 1.0, g + 1, dtype=np.float32)
                for g in grid)
        for _ in range(self.maxiter):
            if shard_imbalance(frac, dd_shape, cuts) + 1.0 \
                    <= self.tolerance:
                break
            new = balance_cuts(frac, dd_shape, grid,
                               np.asarray(box.L), fast['rcut'],
                               cuts=cuts,
                               skin_floor=fast.get('r_buff', 0.4) / 2)
            cuts = tuple(n if en else c for n, c, en
                         in zip(new, cuts, self.enable_axes))
        system._dd_cuts = cuts
        # invalidate the carry (state was just materialized above) and
        # repack dyn so the new cuts reach the step program
        system.state = system.state
        system._params_dirty = True
