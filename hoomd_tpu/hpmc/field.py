"""HPMC external fields (reference hpmc/ExternalField*.h, hpmc/field.py)."""

from __future__ import annotations

import numpy as np

from .. import context


class lattice_field:
    """Einstein-crystal harmonic restraint to reference lattice positions
    (reference hpmc.field.lattice_field, ExternalFieldLattice.h): MC moves
    gain a Metropolis factor exp(-k |r - r0|^2) (and -q for orientations,
    not yet applied).  Used with update.remove_drift and the Frenkel-Ladd
    free-energy protocol."""

    def __init__(self, mc, position=None, orientation=None, k=0.0, q=0.0,
                 symmetry=None, composite=False):
        self.mc = mc
        self.k = float(k)
        self.reference_positions = np.asarray(position, dtype=float)
        mc._external = self
        context.current.system._dirty()

    def set_params(self, k=None, q=None):
        if k is not None:
            self.k = float(k)
        context.current.system._dirty()

    def get_energy(self):
        import jax.numpy as jnp
        system = context.current.system
        st = system.state
        ref = jnp.asarray(self.reference_positions, st.pos.dtype)[st.tag]
        dr = st.box.min_image(st.pos - ref)
        return float(self.k * jnp.sum(dr * dr))

    def energy_fn(self, x, tags, state):
        """Per-trial-particle field energy used in the MC acceptance."""
        import jax.numpy as jnp
        ref = jnp.asarray(self.reference_positions, x.dtype)
        r0 = ref[tags]
        dr = state.box.min_image(x - r0)
        return self.k * jnp.sum(dr * dr, axis=-1)


class external_field_composite:
    """Compose several external fields
    (reference ExternalFieldComposite.h)."""

    def __init__(self, mc, fields=None):
        self.fields = list(fields or [])

    def add_field(self, field):
        self.fields.append(field)


class wall:
    """Hard walls for HPMC (reference ExternalFieldWall.h)."""

    def __init__(self, mc, walls):
        raise NotImplementedError(
            "hpmc.field.wall: hard walls for MC not yet implemented")


class callback:
    """Arbitrary python energy field (reference ExternalCallback)."""

    def __init__(self, mc, energy_function, composite=False):
        self.mc = mc
        self.energy_function = energy_function
        mc._external = self
        context.current.system._dirty()

    def energy_fn(self, x, tags, state):
        return self.energy_function(x, tags, state)

    def get_energy(self):
        return 0.0
