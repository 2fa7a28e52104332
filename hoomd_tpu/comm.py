"""Communication info (reference hoomd/comm.py:85-257).

The reference exposes MPI rank/partition topology; JAX is single-controller
in this deployment, so rank maps to jax.process_index and the decomposition
object records the requested device-mesh split used by parallel.domain.
"""

from __future__ import annotations


def get_rank():
    import jax
    return jax.process_index()


def get_num_ranks():
    import jax
    return jax.process_count()


def get_partition():
    return 0


def barrier():
    pass


def barrier_all():
    pass


class decomposition:
    """Requested domain decomposition (reference comm.decomposition):
    records the mesh split; parallel.domain consumes it."""

    def __init__(self, x=None, y=None, z=None, nx=None, ny=None, nz=None):
        self.nx, self.ny, self.nz = nx, ny, nz
        self.fractions = (x, y, z)
