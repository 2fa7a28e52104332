"""Slab-decomposed distributed 3-D FFT (the reference's dfftlib,
hoomd/extern/dfftlib + md/PPPMForceCompute.h:185-186, rebuilt as JAX
collectives).

Motivation (measured, HLO inspection on an 8-device mesh): XLA has no
distributed FFT lowering — `jnp.fft.fftn` on a sharded operand inserts
an ALL-GATHER of the full mesh to every device and runs the complete
3-D transform redundantly on each.  Correct, and fine for the small
meshes PPPM uses on a few devices, but O(mesh) memory and O(mesh)
bandwidth per device — not a scalable transform.

The slab scheme here is the standard two-stage decomposition:

  x-slabs:  (Nx/S, Ny, Nz)  -- local FFT over (y, z)
     |  one tiled all_to_all (the transpose; ICI-resident)
  y-slabs:  (Nx, Ny/S, Nz)  -- local FFT over x

so each device transforms only its shard and the only communication is
one all-to-all each way.  The inverse runs the stages in reverse.
Requires Nx % S == 0 and Ny % S == 0 (the caller falls back to the
all-gather path otherwise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def make_slab_fft(mesh, axis='domain'):
    """Returns (fftn, ifftn) over a 1-D mesh axis.

    fftn: (Nx, Ny, Nz) sharded on axis 0 -> k-space array sharded on
    axis 1.  ifftn: the exact inverse layout.  Elementwise k-space work
    (Green's function multiply, ik differentiation) runs on the
    y-sharded layout with no resharding."""
    S = mesh.shape[axis]

    def _fwd(r):                     # (Nx/S, Ny, Nz) local shard
        b = jnp.fft.fftn(r, axes=(1, 2))
        b = jax.lax.all_to_all(b, axis, split_axis=1, concat_axis=0,
                               tiled=True)
        return jnp.fft.fft(b, axis=0)     # (Nx, Ny/S, Nz)

    def _inv(b):                     # (Nx, Ny/S, Nz) local shard
        b = jnp.fft.ifft(b, axis=0)
        b = jax.lax.all_to_all(b, axis, split_axis=0, concat_axis=1,
                               tiled=True)
        return jnp.fft.ifftn(b, axes=(1, 2))  # (Nx/S, Ny, Nz)

    def fftn(rho):
        return jax.shard_map(_fwd, mesh=mesh, in_specs=P(axis),
                             out_specs=P(None, axis),
                             check_vma=False)(rho)

    def ifftn(rk):
        return jax.shard_map(_inv, mesh=mesh, in_specs=P(None, axis),
                             out_specs=P(axis),
                             check_vma=False)(rk)

    return fftn, ifftn


def slab_ok(mesh, axis, Nx, Ny):
    """Feasibility: both decomposed axes must divide the mesh size."""
    if mesh is None or axis not in mesh.shape:
        return False
    S = mesh.shape[axis]
    return S > 1 and Nx % S == 0 and Ny % S == 0
