"""Device mesh construction.

The reference builds a 3D MPI rank grid with a node-local second level
(hoomd/DomainDecomposition.h:49-175).  The TPU-native analog is a
jax.sharding.Mesh whose axes name the parallelism strategies:

  * 'replica' — ensemble/partition parallelism (the reference's --nrank
    partitions, ExecutionConfiguration.h:185): independent simulations.
  * 'domain'  — decomposition of one simulation's particles across chips
    (the reference's DomainDecomposition).

Collectives ride ICI when the mesh is built over one slice; a future
multi-slice deployment maps 'replica' onto the DCN axis (cheap, no per-step
traffic crosses it) and 'domain' within slices — the same two-level design
as the reference's node-local grids.
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_replica=1, n_domain=None, devices=None):
    """Mesh with ('replica', 'domain') axes over the available devices."""
    import jax
    from jax.sharding import Mesh
    if devices is None:
        devices = jax.devices()
    if n_domain is None:
        n_domain = len(devices) // n_replica
    if n_replica * n_domain != len(devices):
        raise ValueError(f"{n_replica}x{n_domain} mesh != "
                         f"{len(devices)} devices")
    arr = np.array(devices).reshape(n_replica, n_domain)
    return Mesh(arr, ('replica', 'domain'))
