"""Snapshot construction and live system data access
(reference hoomd/data.py:507-1300).

``make_snapshot`` builds an empty host snapshot; ``system_data`` wraps the
running System with take_snapshot/restore_snapshot and a live box property.
Per-particle "proxy" access of the reference (system.particles[i].position)
is provided read/write through snapshots — per-element device access would
defeat the HBM-resident design.
"""

from __future__ import annotations

import numpy as np

from . import context
from .snapshot import BoxSnapshot as boxdim  # noqa: F401  (hoomd.data.boxdim)
from .snapshot import Snapshot


def make_snapshot(N, box, particle_types=None, bond_types=None,
                  angle_types=None, dihedral_types=None,
                  improper_types=None, pair_types=None, dtype='float'):
    """Empty snapshot with N particles (reference data.make_snapshot)."""
    if particle_types is None:
        particle_types = ['A']
    return Snapshot(N, box, particle_types=particle_types,
                    bond_types=bond_types, angle_types=angle_types,
                    dihedral_types=dihedral_types,
                    improper_types=improper_types, pair_types=pair_types)


class system_data:
    """Live access to the running system (reference data.system_data)."""

    def __init__(self, system):
        self._system = system

    @property
    def box(self):
        st = self._system.state
        L = np.asarray(st.box.L)
        t = np.asarray(st.box.tilt)
        return boxdim(L[0], L[1], L[2], t[0], t[1], t[2],
                      dimensions=st.box.dimensions)

    @box.setter
    def box(self, b):
        import jax.numpy as jnp
        st = self._system.state
        dt = st.pos.dtype
        new_box = st.box.replace(
            L=jnp.asarray([b.Lx, b.Ly, b.Lz], dtype=dt),
            tilt=jnp.asarray([b.xy, b.xz, b.yz], dtype=dt))
        pos, image = new_box.wrap(st.pos, st.image)
        self._system.state = st.replace(pos=pos, image=image, box=new_box)
        self._system.reset_nlist()
        self._system._dirty()

    def take_snapshot(self, particles=True, bonds=False, all=False,
                      dtype='float'):
        return self._system.take_snapshot()

    def restore_snapshot(self, snapshot):
        self._system.restore_snapshot(snapshot)
        self._system.reset_nlist()

    def replicate(self, nx=1, ny=1, nz=1):
        snap = self._system.take_snapshot().replicate(nx, ny, nz)
        self._system.restore_snapshot(snap)

    @property
    def particles(self):
        return _particle_view(self._system)


class _particle_view:
    """Read-mostly particle access via an implicit snapshot."""

    def __init__(self, system):
        self._system = system
        self._snap = system.take_snapshot()

    def __len__(self):
        return self._snap.particles.N

    @property
    def types(self):
        return self._snap.particles.types

    @property
    def position(self):
        return self._snap.particles.position

    @property
    def velocity(self):
        return self._snap.particles.velocity

    @property
    def typeid(self):
        return self._snap.particles.typeid
