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
    """Partition index (reference comm.get_partition): replica-axis
    slice when a ('replica','domain') mesh is active, else 0."""
    from . import context
    ctx = context.current
    mesh = getattr(ctx, 'mesh', None) if ctx is not None else None
    if mesh is not None and 'replica' in mesh.axis_names:
        import jax
        # single-controller: this process owns every replica; report the
        # replica slice of the default device, matching the reference's
        # per-rank view
        dev = jax.devices()[0]
        idx = list(mesh.devices.flatten()).index(dev) \
            if dev in mesh.devices.flatten() else 0
        return idx // mesh.shape.get('domain', 1)
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
