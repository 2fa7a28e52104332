"""Deprecated initializers (reference deprecated/init.py,
deprecated/RandomGenerator.h): XML reader, random gas, random polymers."""

from __future__ import annotations

import re

import numpy as np

from .. import context
from ..init import _finish_init, create_random  # noqa: F401 (re-export)
from ..snapshot import BoxSnapshot, Snapshot


def read_xml(filename, restart=None, time_step=None, wrap_coordinates=False):
    """Read a HOOMD-1 XML file (reference deprecated.init.read_xml)."""
    import xml.etree.ElementTree as ET
    tree = ET.parse(filename)
    cfg = tree.getroot().find('configuration')
    box_el = cfg.find('box')
    box = BoxSnapshot(float(box_el.get('lx')), float(box_el.get('ly')),
                      float(box_el.get('lz')), float(box_el.get('xy', 0)),
                      float(box_el.get('xz', 0)),
                      float(box_el.get('yz', 0)),
                      dimensions=int(cfg.get('dimensions', 3)))
    pos_text = cfg.find('position').text.strip().split()
    pos = np.array(pos_text, dtype=float).reshape(-1, 3)
    N = len(pos)
    types_el = cfg.find('type')
    tnames = types_el.text.split() if types_el is not None else ['A'] * N
    uniq = sorted(set(tnames))
    snap = Snapshot(N, box, particle_types=uniq)
    snap.particles.position[:] = pos
    snap.particles.typeid[:] = [uniq.index(t) for t in tnames]
    vel_el = cfg.find('velocity')
    if vel_el is not None:
        snap.particles.velocity[:] = np.array(
            vel_el.text.strip().split(), dtype=float).reshape(-1, 3)
    bond_el = cfg.find('bond')
    if bond_el is not None and bond_el.text and bond_el.text.strip():
        rows = bond_el.text.strip().split('\n')
        btypes = sorted({r.split()[0] for r in rows})
        snap.bonds.types = btypes
        snap.bonds.resize(len(rows))
        for i, r in enumerate(rows):
            t, a, b = r.split()
            snap.bonds.typeid[i] = btypes.index(t)
            snap.bonds.group[i] = [int(a), int(b)]
    sysdata = _finish_init(snap)
    if time_step is not None:
        import jax.numpy as jnp
        s = context.current.system
        s.state = s.state.replace(
            timestep=jnp.asarray(int(time_step),
                                 dtype=s.state.timestep.dtype))
    return sysdata


def create_random_polymers(box, polymers, separation, seed=1):
    """Random-walk polymer initializer
    (reference deprecated.init.create_random_polymers): places
    non-overlapping random walks with the requested bond length."""
    rng = np.random.RandomState(seed)
    all_pos = []
    all_types = []
    bonds = []
    L = np.array([box.Lx, box.Ly, box.Lz])
    min_sep = min(separation.values()) * 2 if separation else 0.9
    for poly in polymers:
        bond_len = poly['bond_len']
        seq = poly['type']
        count = poly['count']
        for _ in range(count):
            for attempt in range(200):
                start = (rng.rand(3) - 0.5) * L
                chain = [start]
                ok = True
                for _ in range(len(seq) - 1):
                    for _ in range(50):
                        step = rng.normal(size=3)
                        step *= bond_len / np.linalg.norm(step)
                        nxt = chain[-1] + step
                        if not all_pos or _min_dist(
                                nxt, np.array(all_pos + chain), L) \
                                > min_sep * 0.8:
                            chain.append(nxt)
                            break
                    else:
                        ok = False
                        break
                if ok and len(chain) == len(seq):
                    base = len(all_pos)
                    all_pos.extend(chain)
                    all_types.extend(seq)
                    bonds.extend([[base + k, base + k + 1]
                                  for k in range(len(seq) - 1)])
                    break
            else:
                raise RuntimeError("create_random_polymers: placement "
                                   "failed; lower the density")
    uniq = sorted(set(all_types))
    snap = Snapshot(len(all_pos), box, particle_types=uniq,
                    bond_types=['polymer'])
    pos = np.array(all_pos)
    pos -= L * np.round(pos / L)
    snap.particles.position[:] = pos
    snap.particles.typeid[:] = [uniq.index(t) for t in all_types]
    snap.bonds.resize(len(bonds))
    snap.bonds.group[:] = bonds
    return _finish_init(snap)


def _min_dist(p, pts, L):
    d = pts - p
    d -= L * np.round(d / L)
    return np.linalg.norm(d, axis=1).min()
