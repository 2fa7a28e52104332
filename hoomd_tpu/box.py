"""Triclinic simulation box as a traced pytree.

TPU-native re-design of the reference's ``BoxDim`` value type
(hoomd/BoxDim.h:33-72): same parameterization — edge lengths L and tilt
factors (xy, xz, yz) defining lattice vectors a1=(Lx,0,0),
a2=(xy*Ly, Ly, 0), a3=(xz*Lz, yz*Lz, Lz) — but implemented as a JAX
dataclass whose methods (wrap / min_image / fractions) are pure vectorized
functions usable inside jit.  The box lives inside the simulation State so
box-changing updaters (NPT, box_resize) stay on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ._config import real_dtype


@struct.dataclass
class Box:
    """Periodic triclinic box centered on the origin.

    Fields are jnp arrays so Box is a pytree: L (3,), tilt (3,) = (xy,xz,yz),
    periodic (3,) bool.  ``dimensions`` (2 or 3) is static metadata.
    """

    L: jnp.ndarray
    tilt: jnp.ndarray
    periodic: jnp.ndarray
    dimensions: int = struct.field(pytree_node=False, default=3)

    # -- constructors ------------------------------------------------------
    @staticmethod
    def create(Lx, Ly=None, Lz=None, xy=0.0, xz=0.0, yz=0.0, dimensions=3,
               periodic=(True, True, True)):
        if Ly is None:
            Ly = Lx
        if Lz is None:
            Lz = Lx if dimensions == 3 else 1.0
        dt = real_dtype()
        return Box(
            L=jnp.asarray([Lx, Ly, Lz], dtype=dt),
            tilt=jnp.asarray([xy, xz, yz], dtype=dt),
            periodic=jnp.asarray(periodic, dtype=bool),
            dimensions=dimensions,
        )

    # -- geometry ----------------------------------------------------------
    @property
    def lo(self):
        h = self.lattice_vectors()
        return -0.5 * (h[:, 0] + h[:, 1] + h[:, 2])

    @property
    def hi(self):
        return -self.lo

    def lattice_vectors(self):
        """3x3 cell matrix h with columns a1, a2, a3 (BoxDim.h:53-60)."""
        Lx, Ly, Lz = self.L[0], self.L[1], self.L[2]
        xy, xz, yz = self.tilt[0], self.tilt[1], self.tilt[2]
        z = jnp.zeros((), dtype=self.L.dtype)
        return jnp.stack([
            jnp.stack([Lx, xy * Ly, xz * Lz]),
            jnp.stack([z, Ly, yz * Lz]),
            jnp.stack([z, z, Lz]),
        ])

    def volume(self):
        if self.dimensions == 2:
            return self.L[0] * self.L[1]
        return self.L[0] * self.L[1] * self.L[2]

    # -- coordinate transforms ---------------------------------------------
    def make_fraction(self, pos):
        """Map positions to box fractions in [0,1) (BoxDim::makeFraction)."""
        Lx, Ly, Lz = self.L[0], self.L[1], self.L[2]
        xy, xz, yz = self.tilt[0], self.tilt[1], self.tilt[2]
        fz = pos[..., 2] / Lz
        fy = (pos[..., 1] - fz * yz * Lz) / Ly
        fx = (pos[..., 0] - fy * xy * Ly - fz * xz * Lz) / Lx
        return jnp.stack([fx, fy, fz], axis=-1) + 0.5

    def from_fraction(self, f):
        """Inverse of make_fraction: box fraction -> cartesian position.

        ELEMENTWISE on purpose: `g @ h.T` is a matmul, and the TPU MXU
        runs f32 matmuls as single-pass bf16 — positions would quantize
        to ~8 mantissa bits (measured 0.0185 sigma on a 34.7 sigma box).
        """
        g = f - 0.5
        Lx, Ly, Lz = self.L[0], self.L[1], self.L[2]
        xy, xz, yz = self.tilt[0], self.tilt[1], self.tilt[2]
        x = g[..., 0] * Lx + g[..., 1] * xy * Ly + g[..., 2] * xz * Lz
        y = g[..., 1] * Ly + g[..., 2] * yz * Lz
        z = g[..., 2] * Lz
        return jnp.stack([x, y, z], axis=-1)

    def min_image(self, dr):
        """Nearest periodic image of displacement vectors (BoxDim::minImage).

        Applies the triclinic shear-aware reduction: z first, then y, then x,
        subtracting whole lattice vectors.
        """
        Lx, Ly, Lz = self.L[0], self.L[1], self.L[2]
        xy, xz, yz = self.tilt[0], self.tilt[1], self.tilt[2]
        x, y, z = dr[..., 0], dr[..., 1], dr[..., 2]
        pz = self.periodic[2]
        img = jnp.where(pz, jnp.round(z / Lz), 0.0)
        z = z - Lz * img
        y = y - yz * Lz * img
        x = x - xz * Lz * img
        py = self.periodic[1]
        img = jnp.where(py, jnp.round(y / Ly), 0.0)
        y = y - Ly * img
        x = x - xy * Ly * img
        px = self.periodic[0]
        img = jnp.where(px, jnp.round(x / Lx), 0.0)
        x = x - Lx * img
        return jnp.stack([x, y, z], axis=-1)

    def wrap(self, pos, image):
        """Wrap positions into the box, accumulating image flags
        (BoxDim::wrap semantics).

        The lattice-vector combination is ELEMENTWISE, not `shift @
        h.T`: the TPU MXU lowers f32 matmuls to single-pass bf16, so
        the matmul form subtracts a bf16-ROUNDED box length — every
        boundary crossing kicked the particle by ~L*2^-9 (measured
        0.0185 sigma at L=34.7), a steady energy injection that sent
        the 32k Kremer-Grest benchmark into a FENE blowup."""
        f = self.make_fraction(pos)
        shift = jnp.where(self.periodic, jnp.floor(f), 0.0)
        Lx, Ly, Lz = self.L[0], self.L[1], self.L[2]
        xy, xz, yz = self.tilt[0], self.tilt[1], self.tilt[2]
        sx = (shift[..., 0] * Lx + shift[..., 1] * xy * Ly
              + shift[..., 2] * xz * Lz)
        sy = shift[..., 1] * Ly + shift[..., 2] * yz * Lz
        sz = shift[..., 2] * Lz
        new_pos = pos - jnp.stack([sx, sy, sz], axis=-1)
        new_image = image + shift.astype(image.dtype)
        return new_pos, new_image

    # -- host-side helpers ---------------------------------------------------
    def to_numpy(self):
        return (np.asarray(self.L), np.asarray(self.tilt),
                np.asarray(self.periodic))

    def __repr__(self):  # pragma: no cover - debugging aid
        L = np.asarray(self.L)
        t = np.asarray(self.tilt)
        return (f"Box(Lx={L[0]:g}, Ly={L[1]:g}, Lz={L[2]:g}, "
                f"xy={t[0]:g}, xz={t[1]:g}, yz={t[2]:g}, "
                f"dimensions={self.dimensions})")
