"""Particle groups (reference hoomd/group.py:153-599, ParticleGroup.h).

A group is an immutable set of particle *tags* (so membership survives
re-sorting).  Inside jitted steps the group becomes a per-tag boolean mask
gathered by state.tag — the TPU-native form of the reference's member index
arrays.  Set algebra (union / intersection / difference) matches the
reference's free functions.
"""

from __future__ import annotations

import numpy as np

from . import context


class group:
    def __init__(self, name, member_tags):
        self.name = name
        self.member_tags = np.unique(np.asarray(member_tags,
                                                dtype=np.int64))

    def __len__(self):
        return len(self.member_tags)

    def __repr__(self):
        return f"group {self.name!r} ({len(self)} particles)"


def _sys():
    if context.current is None or context.current.system is None:
        raise RuntimeError("initialize the system first")
    return context.current.system


def all():
    """Every particle (group.py:153)."""
    s = _sys()
    return group('all', np.arange(s.state.N))


def type(type=None, name=None, update=False):
    """All particles of one type (group.py type selector)."""
    s = _sys()
    tid = s.particle_types.index(type)
    snap = s.snapshot_template
    tags = np.nonzero(snap.particles.typeid == tid)[0]
    return group(name or f"type_{type}", tags)


def tags(tag_min, tag_max=None, name=None):
    """Tag range [tag_min, tag_max] inclusive (group.py tags selector)."""
    if tag_max is None:
        tag_max = tag_min
    return group(name or f"tags_{tag_min}-{tag_max}",
                 np.arange(tag_min, tag_max + 1))


def tag_list(name, tags):
    return group(name, np.asarray(tags))


def charged(name='charged'):
    s = _sys()
    q = s.snapshot_template.particles.charge
    return group(name, np.nonzero(q != 0)[0])


def rigid(name='rigid'):
    s = _sys()
    b = s.snapshot_template.particles.body
    return group(name, np.nonzero(b != -1)[0])


def nonrigid(name='nonrigid'):
    s = _sys()
    b = s.snapshot_template.particles.body
    return group(name, np.nonzero(b == -1)[0])


def cuboid(name, xmin=None, xmax=None, ymin=None, ymax=None, zmin=None,
           zmax=None):
    """Particles inside a cuboid at group-creation time
    (group.py cuboid selector)."""
    s = _sys()
    import numpy as np
    pos = np.asarray(s.state.pos)[np.asarray(s.state.rtag)]
    keep = np.ones(len(pos), dtype=bool)
    for axis, lo, hi in ((0, xmin, xmax), (1, ymin, ymax), (2, zmin, zmax)):
        if lo is not None:
            keep &= pos[:, axis] >= lo
        if hi is not None:
            keep &= pos[:, axis] < hi
    return group(name, np.nonzero(keep)[0])


def union(name, a, b):
    return group(name, np.union1d(a.member_tags, b.member_tags))


def intersection(name, a, b):
    return group(name, np.intersect1d(a.member_tags, b.member_tags))


def difference(name, a, b):
    return group(name, np.setdiff1d(a.member_tags, b.member_tags))


def rigid_center(name='rigid_center'):
    """Central particles of rigid bodies: body tag == own tag
    (reference group.rigid_center)."""
    s = _sys()
    b = s.snapshot_template.particles.body
    tags = np.nonzero(b == np.arange(len(b)))[0]
    return group(name, tags)
