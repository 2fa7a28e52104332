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
    """Partition index (reference comm.get_partition,
    hoomd/comm.py:85-257).

    The reference's partitions are MPI sub-communicators: each rank
    belongs to exactly one partition and sees its own index.  Here the
    deployment is single-controller — ONE Python process drives every
    device, and replica (partition) parallelism is a *batching
    transform* (`ensemble.replicas` vmaps n simulations into one
    program), not n processes.  There is therefore no per-process
    partition identity to report: this returns the process's partition
    offset (0 unless a multi-controller deployment splits processes
    across replicas).  Per-replica values (seeds, coupling parameters,
    Gibbs pairing) are expressed as vmapped arrays inside
    `ensemble.replicas`, which is where the reference's
    `get_partition()`-keyed logic lands in this architecture."""
    import jax
    from . import context
    ctx = context.current
    mesh = getattr(ctx, 'mesh', None) if ctx is not None else None
    if (mesh is not None and 'replica' in mesh.axis_names
            and jax.process_count() > 1):
        # multi-controller: processes tile the replica axis in order
        n_rep = mesh.shape['replica']
        return (jax.process_index() * n_rep) // jax.process_count()
    return 0


def barrier():
    """Wait for all enqueued device work to complete — the
    single-controller analog of MPI_Barrier (reference comm.barrier):
    after this returns, every device has drained its execution queue."""
    import jax
    import jax.numpy as jnp
    for d in jax.devices():
        jax.device_put(jnp.zeros(()), d).block_until_ready()


def barrier_all():
    barrier()


class decomposition:
    """Requested domain decomposition (reference comm.decomposition):
    records the mesh split; parallel.domain consumes it."""

    def __init__(self, x=None, y=None, z=None, nx=None, ny=None, nz=None):
        self.nx, self.ny, self.nz = nx, ny, nz
        self.fractions = (x, y, z)
