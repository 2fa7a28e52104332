"""Multi-chip parallelism (reference MPI DomainDecomposition/Communicator).

mesh: device mesh construction; domain: sharded MD step via shard_map.
"""

from . import mesh, domain

__all__ = ['mesh', 'domain']
