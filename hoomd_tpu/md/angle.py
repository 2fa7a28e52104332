"""Angle potentials (reference md/angle.py:191-374)."""

from __future__ import annotations

import math

import numpy as np

from ..ops import bonded as _ops
from ._bonded import BondedForce


def _read_vt_file(filename, width, xname, x0, x1):
    """Parse the reference's 3-column table files (x V T), skipping
    comments (reference md/angle.py table.set_from_file)."""
    rows = []
    with open(filename) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith('#'):
                continue
            cols = line.split()
            if len(cols) != 3:
                raise RuntimeError(
                    f"table.set_from_file: expected 3 columns, got "
                    f"{len(cols)}: {line!r}")
            rows.append([float(c) for c in cols])
    data = np.asarray(rows)
    if data.shape[0] != width:
        raise RuntimeError(
            f"table.set_from_file: file has {data.shape[0]} rows but "
            f"width={width}")
    dx = (x1 - x0) / (width - 1)
    for i, x in enumerate(data[:, 0]):
        if abs(x - (x0 + i * dx)) > 1e-3 * max(abs(dx), 1.0):
            raise RuntimeError(
                f"table.set_from_file: {xname} column must be uniform "
                f"on [{x0}, {x1}] (row {i}: {x})")
    return data[:, 1], data[:, 2]


class _vt_table(BondedForce):
    """Shared tabulated-V/T machinery for angle.table / dihedral.table.

    The user supplies V(x) and T(x) = -dV/dx on `width` uniform grid
    points; the energy is the linear interpolation of V, and the force
    comes from the linear interpolation of T through a custom JVP — the
    reference's exact semantics (md/TableAngleForceCompute.cc,
    md/TableDihedralForceCompute.cc) rather than the piecewise-constant
    derivative autodiff of the V interpolation would give."""

    _coeff_names = ('func',)
    _xrange = (0.0, math.pi)        # angle domain; dihedral overrides

    def __init__(self, width, name=None):
        self.width = int(width)
        if self.width < 2:
            raise ValueError("table: width must be >= 2")
        BondedForce.__init__(self, name)

    def set_from_file(self, typename, filename):
        x0, x1 = self._xrange
        V, T = _read_vt_file(filename, self.width, 'angle', x0, x1)

        def func(x, V=V, T=T, x0=x0, x1=x1, width=self.width):
            i = np.clip(np.rint((np.asarray(x) - x0) / (x1 - x0)
                                * (width - 1)).astype(int), 0, width - 1)
            return V[i], T[i]
        self.coeff.set(typename, func=func, coeff={})

    def _pack_params(self, system):
        import jax.numpy as jnp
        data = self._topology_data(system)
        dt = system.real_dtype
        nt = len(data.types)
        x0, x1 = self._xrange
        V = np.zeros((nt, self.width))
        T = np.zeros((nt, self.width))
        for i, t in enumerate(data.types):
            func = self.coeff.get(t, 'func')
            kw = self.coeff.get(t, 'coeff', {}) or {}
            if func is None:
                raise RuntimeError(
                    f"{self._log_prefix}: coefficients missing for "
                    f"type {t}")
            x = np.linspace(x0, x1, self.width)
            v, tq = func(x, **kw)
            V[i], T[i] = np.broadcast_to(v, x.shape), \
                np.broadcast_to(tq, x.shape)
        tid = data.typeid
        return {'V': jnp.asarray(V[tid], dtype=dt),
                'T': jnp.asarray(T[tid], dtype=dt)}

    def _coordinate(self, disps):
        raise NotImplementedError

    def _make_compute(self, system):
        import jax
        import jax.numpy as jnp
        width = self.width
        x0, x1 = self._xrange
        data = self._topology_data(system)
        group_tags = jnp.asarray(data.group)
        coord = type(self)._coordinate

        def _interp(tab, x):
            u = jnp.clip((x - x0) / (x1 - x0) * (width - 1), 0.0,
                         width - 1.000001)
            i0 = u.astype(jnp.int32)
            fr = u - i0
            return tab[i0] * (1 - fr) + tab[i0 + 1] * fr

        @jax.custom_jvp
        def vt(x, V, T):
            return _interp(V, x)

        @vt.defjvp
        def _vt_jvp(primals, tangents):
            x, V, T = primals
            dx = tangents[0]
            # T = -dV/dx by the user contract, so dV = -T dx
            return _interp(V, x), -_interp(T, x) * dx

        def energy_fn(disps, p):
            return vt(coord(disps), p['V'], p['T'])

        def compute(state, nl, params):
            groups = state.rtag[group_tags]
            return _ops.bonded_force(state.pos, state.box, groups,
                                     params, energy_fn)
        return compute


class harmonic(BondedForce):
    """V = k/2 (theta - t0)^2 (md/HarmonicAngleForceCompute.cc).
    angle_coeff.set('type', k=..., t0=...)."""
    _topology = 'angles'
    _energy_fn = _ops.angle_harmonic_energy
    _coeff_names = ('k', 't0')
    _log_prefix = 'angle_harmonic'

    def __init__(self, name=None):
        BondedForce.__init__(self, name)
        self.angle_coeff = self.coeff


class cosinesq(BondedForce):
    """V = k/2 (cos theta - cos t0)^2 (md/CosineSqAngleForceCompute.cc)."""
    _topology = 'angles'
    _energy_fn = _ops.angle_cosinesq_energy
    _coeff_names = ('k', 't0')
    _log_prefix = 'angle_cosinesq'

    def __init__(self, name=None):
        BondedForce.__init__(self, name)
        self.angle_coeff = self.coeff


class table(_vt_table):
    """Tabulated angle potential (reference md/angle.py:374 table,
    md/TableAngleForceCompute.cc): V and T on `width` uniform points
    over theta in [0, pi]; angle_coeff.set('type', func=f,
    coeff=dict(...)) with f(theta, **coeff) -> (V, T)."""
    _topology = 'angles'
    _log_prefix = 'angle_table'
    _xrange = (0.0, math.pi)

    def __init__(self, width, name=None):
        _vt_table.__init__(self, width, name)
        self.angle_coeff = self.coeff

    @staticmethod
    def _coordinate(disps):
        import jax.numpy as jnp
        d1, d2 = disps
        return jnp.arccos(_ops._cos_angle(-d1, d2))
