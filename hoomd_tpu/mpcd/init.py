"""MPCD solvent initialization (reference mpcd/init.py)."""

from __future__ import annotations

import numpy as np

from .. import context
from . import data


def make_random(N, kT, seed):
    """Uniform random solvent filling the MD box with Maxwell-Boltzmann
    velocities (reference mpcd.init.make_random)."""
    sys_ = context.current.system
    if sys_ is None:
        raise RuntimeError("initialize the MD system before mpcd.init")
    rng = np.random.RandomState(seed)
    L = np.asarray(sys_.state.box.L)
    snap = data.snapshot(N)
    snap.position[:] = (rng.rand(N, 3) - 0.5) * L
    v = rng.normal(0, np.sqrt(kT), (N, 3))
    snap.velocity[:] = v - v.mean(axis=0)
    return data.system_data(snap)


def read_snapshot(snapshot):
    """Attach an explicit solvent snapshot (reference
    mpcd.init.read_snapshot)."""
    return data.system_data(snapshot)
