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

    def reset(self, timestep=0):
        """Reset accumulated statistics (reference
        ExternalFieldLattice::reset); energies here are instantaneous,
        so only the protocol hook is needed."""

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
    """Hard walls for HPMC spheres (reference ExternalFieldWall.h,
    hpmc/field.py wall): sphere / cylinder / plane geometries from
    ``md.wall.group`` confine particles; a trial move that would
    penetrate a wall is vetoed through the external-field Metropolis
    hook (a large finite energy per violation, so moves between
    already-violating states remain ergodic, matching the reference's
    behavior of never trapping an invalid start)."""

    _BIG = 1.0e6

    def __init__(self, mc, walls):
        self.mc = mc
        self.walls = walls
        mc._external = self
        context.current.system._dirty()

    def _radii_by_type(self, system):
        return np.array([
            0.5 * float(self.mc.shape_param[t].get('diameter', 1.0))
            for t in system.particle_types])

    def _violations(self, x, r):
        """Count wall violations for positions x (.., 3) with particle
        radii r (..,) — jnp-traceable."""
        import jax.numpy as jnp
        v = 0
        for w in self.walls.spheres:
            o = jnp.asarray(w.origin, x.dtype)
            d = jnp.linalg.norm(x - o, axis=-1)
            bad = (d > w.r - r) if w.inside else (d < w.r + r)
            v = v + bad.astype(jnp.int32)
        for w in self.walls.cylinders:
            o = jnp.asarray(w.origin, x.dtype)
            a = jnp.asarray(w.axis, x.dtype)
            rel = x - o
            perp = rel - jnp.sum(rel * a, axis=-1, keepdims=True) * a
            d = jnp.linalg.norm(perp, axis=-1)
            bad = (d > w.r - r) if w.inside else (d < w.r + r)
            v = v + bad.astype(jnp.int32)
        for w in self.walls.planes:
            o = jnp.asarray(w.origin, x.dtype)
            n = jnp.asarray(w.normal, x.dtype)
            s = jnp.sum((x - o) * n, axis=-1)
            v = v + (s < r).astype(jnp.int32)
        return v

    def energy_fn(self, x, tags, state):
        import jax.numpy as jnp
        system = context.current.system
        rad_t = jnp.asarray(self._radii_by_type(system), x.dtype)
        rows = state.rtag[tags]
        r = rad_t[state.typeid[rows]]
        return self._BIG * self._violations(x, r)

    def count_overlaps(self, system=None):
        """Particles currently violating any wall."""
        import jax.numpy as jnp
        system = system or context.current.system
        st = system.state
        rad_t = jnp.asarray(self._radii_by_type(system), st.pos.dtype)
        r = rad_t[st.typeid]
        return int(jnp.sum(self._violations(st.pos, r) > 0))

    def get_energy(self):
        system = context.current.system
        return self._BIG * float(self.count_overlaps(system))


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


class frenkel_ladd_energy:
    """Frenkel-Ladd Einstein-crystal free-energy protocol (reference
    hpmc/field.py:824 frenkel_ladd_energy): couples a lattice_field with
    spring constant exp(ln_gamma) (rotational q_factor * that) to an
    update.remove_drift, with set_params to anneal the spring along the
    integration path."""

    def __init__(self, mc, ln_gamma, q_factor, r0, q0, drift_period,
                 symmetry=()):
        import math
        from . import update as hpmc_update
        self.mc = mc
        self.q_factor = float(q_factor)
        self.trans_spring_const = math.exp(ln_gamma)
        self.rotat_spring_const = self.q_factor * self.trans_spring_const
        self.lattice_positions = np.asarray(r0, dtype=float)
        self.lattice_orientations = np.asarray(q0, dtype=float)
        self.lattice = lattice_field(
            mc, position=self.lattice_positions,
            orientation=self.lattice_orientations,
            k=self.trans_spring_const, q=self.rotat_spring_const,
            symmetry=list(symmetry))
        self.remove_drift = hpmc_update.remove_drift(
            mc, self.lattice, period=drift_period)

    def reset_statistics(self):
        self.lattice.reset(0)

    def set_params(self, ln_gamma=None, q_factor=None):
        import math
        if q_factor is not None:
            self.q_factor = float(q_factor)
        if ln_gamma is not None:
            self.trans_spring_const = math.exp(ln_gamma)
        self.rotat_spring_const = self.q_factor * self.trans_spring_const
        self.lattice.set_params(self.trans_spring_const,
                                self.rotat_spring_const)

    def get_energy(self):
        return self.lattice.get_energy()
