"""HBM-resident particle state as a single SoA pytree.

TPU-native replacement for the reference's ``ParticleData``
(hoomd/ParticleData.h:1118-1130): the same structure-of-arrays layout
(pos/vel/type/mass/charge/diameter/image/tag/body/orientation/...), but as an
immutable JAX pytree with *static capacity* instead of dynamic per-rank N.
All mutation is functional (``state.replace(...)``) and the whole step
pipeline treats State as the carry of a ``lax.fori_loop``.

Differences from the reference, by design:
  * pos is (N,3) + typeid (N,) rather than packed Scalar4 — XLA lays out and
    fuses SoA arrays natively; there is no benefit to manual float4 packing.
  * tag/rtag index maps are carried in-state so periodic spatial re-sorting
    (the SFCPackUpdater analog, update.sort) is a pure gather.
  * the Box lives in the State so box-changing updaters stay on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from ._config import int_dtype, real_dtype
from .box import Box
from .snapshot import Snapshot


@struct.dataclass
class State:
    pos: jnp.ndarray            # (N,3) real
    vel: jnp.ndarray            # (N,3) real
    image: jnp.ndarray          # (N,3) int
    typeid: jnp.ndarray         # (N,)  int
    tag: jnp.ndarray            # (N,)  int — identity of particle in slot i
    rtag: jnp.ndarray           # (N,)  int — slot of particle with tag t
    mass: jnp.ndarray           # (N,)  real
    charge: jnp.ndarray         # (N,)  real
    diameter: jnp.ndarray       # (N,)  real
    body: jnp.ndarray           # (N,)  int
    orientation: jnp.ndarray    # (N,4) real quaternion
    angmom: jnp.ndarray         # (N,4) real quaternion representation
    moment_inertia: jnp.ndarray  # (N,3) real
    net_force: jnp.ndarray      # (N,3) real
    net_torque: jnp.ndarray     # (N,3) real
    net_pe: jnp.ndarray         # (N,)  real — per-particle potential energy
    net_virial: jnp.ndarray     # (N,6) real — xx,xy,xz,yy,yz,zz
    box: Box
    timestep: jnp.ndarray       # () int

    @property
    def N(self) -> int:
        return self.pos.shape[0]

    def permute(self, order):
        """Reorder particle slots (the SFCPackUpdater analog,
        reference hoomd/SFCPackUpdater.h:38-84).  ``order`` maps new slot ->
        old slot.  rtag is recomputed so tag-addressed data stays valid."""
        idt = int_dtype()
        new_tag = self.tag[order]
        new_rtag = jnp.zeros_like(self.rtag).at[new_tag].set(
            jnp.arange(self.N, dtype=idt))
        return self.replace(
            pos=self.pos[order], vel=self.vel[order],
            image=self.image[order], typeid=self.typeid[order],
            tag=new_tag, rtag=new_rtag, mass=self.mass[order],
            charge=self.charge[order], diameter=self.diameter[order],
            body=self.body[order], orientation=self.orientation[order],
            angmom=self.angmom[order],
            moment_inertia=self.moment_inertia[order],
            net_force=self.net_force[order],
            net_torque=self.net_torque[order],
            net_pe=self.net_pe[order], net_virial=self.net_virial[order])


def state_from_snapshot(snap: Snapshot) -> State:
    """Load a host snapshot into device arrays
    (ParticleData::initializeFromSnapshot analog, hoomd/ParticleData.cc)."""
    dt = real_dtype()
    idt = int_dtype()
    p = snap.particles
    N = p.N
    box = snap.box.to_box()
    state = State(
        pos=jnp.asarray(p.position, dtype=dt),
        vel=jnp.asarray(p.velocity, dtype=dt),
        image=jnp.asarray(p.image, dtype=idt),
        typeid=jnp.asarray(p.typeid, dtype=idt),
        tag=jnp.arange(N, dtype=idt),
        rtag=jnp.arange(N, dtype=idt),
        mass=jnp.asarray(p.mass, dtype=dt),
        charge=jnp.asarray(p.charge, dtype=dt),
        diameter=jnp.asarray(p.diameter, dtype=dt),
        body=jnp.asarray(p.body, dtype=idt),
        orientation=jnp.asarray(p.orientation, dtype=dt),
        angmom=jnp.asarray(p.angmom, dtype=dt),
        moment_inertia=jnp.asarray(p.moment_inertia, dtype=dt),
        net_force=jnp.zeros((N, 3), dtype=dt),
        net_torque=jnp.zeros((N, 3), dtype=dt),
        net_pe=jnp.zeros((N,), dtype=dt),
        net_virial=jnp.zeros((N, 6), dtype=dt),
        box=box,
        timestep=jnp.zeros((), dtype=idt),
    )
    # wrap any out-of-box initial positions
    pos, image = box.wrap(state.pos, state.image)
    return state.replace(pos=pos, image=image)


def snapshot_from_state(state: State, snap_template: Snapshot) -> Snapshot:
    """Gather device state back to a host snapshot in tag order
    (ParticleData::takeSnapshot analog).  ``snap_template`` provides types
    and topology, which live host-side and are not mutated by MD."""
    snap = Snapshot(state.N, particle_types=snap_template.particles.types)
    # copy box back
    L, tilt, _ = state.box.to_numpy()
    snap.box.Lx, snap.box.Ly, snap.box.Lz = (float(L[0]), float(L[1]),
                                             float(L[2]))
    snap.box.xy, snap.box.xz, snap.box.yz = (float(tilt[0]), float(tilt[1]),
                                             float(tilt[2]))
    snap.box.dimensions = state.box.dimensions
    order = np.asarray(state.rtag)  # tag t lives at slot rtag[t]
    p = snap.particles
    p.position[:] = np.asarray(state.pos)[order]
    p.velocity[:] = np.asarray(state.vel)[order]
    m = np.asarray(state.mass)[order]
    p.acceleration[:] = np.asarray(state.net_force)[order] / m[:, None]
    p.typeid[:] = np.asarray(state.typeid)[order]
    p.mass[:] = m
    p.charge[:] = np.asarray(state.charge)[order]
    p.diameter[:] = np.asarray(state.diameter)[order]
    p.image[:] = np.asarray(state.image)[order]
    p.body[:] = np.asarray(state.body)[order]
    p.orientation[:] = np.asarray(state.orientation)[order]
    p.angmom[:] = np.asarray(state.angmom)[order]
    p.moment_inertia[:] = np.asarray(state.moment_inertia)[order]
    # topology copied from template (tag-addressed, invariant under sorting)
    for name in ('bonds', 'angles', 'dihedrals', 'impropers', 'constraints',
                 'pairs'):
        src = getattr(snap_template, name)
        dst = getattr(snap, name)
        dst.types = list(src.types)
        dst.resize(src.N)
        dst.typeid[:] = src.typeid
        dst.group[:] = src.group
        dst.value[:] = src.value
    return snap
