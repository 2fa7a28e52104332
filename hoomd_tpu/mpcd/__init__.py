"""MPCD mesoscale solvent (reference hoomd/mpcd/).

Multi-particle collision dynamics: a lightweight solvent particle store
(reference mpcd::ParticleData, mpcd/ParticleData.h) streamed ballistically
(mpcd/StreamingMethod.h) and collided on a regular cell grid with random
grid shift (mpcd/CellList.h) using stochastic-rotation (SRD,
mpcd/SRDCollisionMethod.h) or Andersen-thermostat (AT,
mpcd/ATCollisionMethod.h) rules.  MD solute particles are embedded in the
collision cells (reference mpcd/__init__.py:38-44).

TPU-native formulation: the solvent is an extra SoA pytree carried through
the jitted step; binning is the same sort-based scatter as the MD cell list;
per-cell reductions are segment-sums; the per-cell random rotation axes come
from counter-based keys — no atomics, fully vectorized.
"""

from . import collide, data, init, stream, update
from .integrate import integrator

__all__ = ['collide', 'data', 'init', 'stream', 'update', 'integrator']
