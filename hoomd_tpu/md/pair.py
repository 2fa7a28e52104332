"""Pair potentials — python API (reference md/pair.py:536-2705).

Each class wires one evaluator from ops/pair_eval.py into the shared
neighbor-list pair driver (ops/pair_force.py).  Coefficients follow the
reference's ``pair_coeff.set('A', 'B', epsilon=..., ...)`` protocol including
per-pair r_cut / r_on overrides and list/wildcard type arguments, and shift
modes 'none' / 'shift' / 'xplor' (PotentialPair.h:83-147).
"""

from __future__ import annotations

import numpy as np

from .. import context
from ..operation import Force
from ..ops import pair_eval
from ..ops.pair_force import pair_force_nlist


class coeff:
    """Pair coefficient matrix (reference md/pair.py coeff class)."""

    def __init__(self):
        self.values = {}
        self.defaults = {}

    @staticmethod
    def _listify(x):
        return x if isinstance(x, (list, tuple)) else [x]

    def set(self, a, b, **coeffs):
        for ta in self._listify(a):
            for tb in self._listify(b):
                key = tuple(sorted((ta, tb)))
                self.values.setdefault(key, {}).update(coeffs)

    def get(self, a, b, name):
        key = tuple(sorted((a, b)))
        if key in self.values and name in self.values[key]:
            return self.values[key][name]
        if name in self.defaults:
            return self.defaults[name]
        return None

    def verify(self, types, names, defaults):
        missing = []
        for i, a in enumerate(types):
            for b in types[i:]:
                for n in names:
                    if n in defaults:
                        continue
                    if self.get(a, b, n) is None:
                        missing.append((a, b, n))
        if missing:
            raise RuntimeError(
                "pair coefficients missing: " +
                ", ".join(f"{a}-{b}:{n}" for a, b, n in missing) +
                " — set them with pair_coeff.set() before run()")


class pair(Force):
    """Shared machinery for all isotropic pair potentials
    (reference PotentialPair template, md/PotentialPair.h:83-309)."""

    _evaluator = None  # override

    def __init__(self, r_cut, nlist, name=None):
        Force.__init__(self, name)
        self._log_base = f"pair_{type(self).__name__}_energy"
        self.r_cut = float(r_cut) if r_cut is not None else None
        self.pair_coeff = coeff()
        self.mode = 'none'
        self._nlist = nlist
        nlist.subscribe(self)
        context.current.system.add_force(self)

    def set_params(self, mode=None):
        """Energy shift mode: 'none' | 'shift' | 'xplor'
        (md/pair.py set_params)."""
        if mode is not None:
            if mode not in ('none', 'shift', 'xplor'):
                raise ValueError(f"invalid shift mode {mode!r}")
            self.mode = mode
            context.current.system._dirty()

    # -- tables ------------------------------------------------------------
    def _rcut_matrix(self, types):
        nt = len(types)
        m = np.zeros((nt, nt))
        for i, a in enumerate(types):
            for j, b in enumerate(types):
                rc = self.pair_coeff.get(a, b, 'r_cut')
                m[i, j] = self.r_cut if rc is None else rc
        return m

    def _coeff_tables(self, types):
        ev = self._evaluator
        self.pair_coeff.verify(types, ev.coeff_names, ev.defaults)
        nt = len(types)
        raw = {}
        for name in ev.coeff_names:
            t = np.zeros((nt, nt))
            for i, a in enumerate(types):
                for j, b in enumerate(types):
                    v = self.pair_coeff.get(a, b, name)
                    if v is None:
                        v = ev.defaults[name]
                    t[i, j] = float(v)
            raw[name] = t
        return raw

    def _ron_matrix(self, types):
        nt = len(types)
        rc = self._rcut_matrix(types)
        m = np.zeros((nt, nt))
        for i, a in enumerate(types):
            for j, b in enumerate(types):
                ro = self.pair_coeff.get(a, b, 'r_on')
                m[i, j] = rc[i, j] if ro is None else ro
        return m

    def _pack_params(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        dt = system.real_dtype
        raw = {k: jnp.asarray(v, dtype=dt)
               for k, v in self._coeff_tables(types).items()}
        derived = self._evaluator.derive(raw)
        packed = {
            'tables': {k: jnp.asarray(v, dtype=dt)
                       for k, v in derived.items()},
            'rcut': jnp.asarray(self._rcut_matrix(types), dtype=dt),
        }
        if self.mode == 'xplor':
            packed['ron'] = jnp.asarray(self._ron_matrix(types), dtype=dt)
        return packed

    def _make_compute(self, system):
        ev = self._evaluator
        mode = self.mode

        def compute(state, nl, params):
            return pair_force_nlist(
                state.pos, state.typeid, state.charge, state.diameter,
                nl.idx, state.box, ev, params['tables'], params['rcut'],
                ron_table=params.get('ron'), mode=mode)
        return compute


def _make_pair_class(eval_name, doc):
    ev = pair_eval.ALL_EVALUATORS[eval_name]

    class _P(pair):
        __doc__ = doc
        _evaluator = ev

        def __init__(self, r_cut, nlist, name=None):
            pair.__init__(self, r_cut, nlist, name=name)
    _P.__name__ = eval_name
    _P.__qualname__ = eval_name
    return _P


lj = _make_pair_class('lj', "Lennard-Jones pair (md/pair.py lj; "
                            "EvaluatorPairLJ.h).")
gauss = _make_pair_class('gauss', "Gaussian pair (md/pair.py gauss).")
yukawa = _make_pair_class('yukawa', "Yukawa pair (md/pair.py yukawa).")
morse = _make_pair_class('morse', "Morse pair (md/pair.py morse).")
mie = _make_pair_class('mie', "Mie pair (md/pair.py mie).")
buckingham = _make_pair_class('buckingham',
                              "Buckingham pair (md/pair.py buckingham).")
lj1208 = _make_pair_class('lj1208', "LJ 12-8 pair (md/pair.py lj1208).")
force_shifted_lj = _make_pair_class(
    'force_shifted_lj', "Force-shifted LJ (md/pair.py force_shifted_lj).")
reaction_field = _make_pair_class(
    'reaction_field', "Onsager reaction field (md/pair.py reaction_field).")
ewald = _make_pair_class(
    'ewald', "Real-space Ewald (md/pair.py ewald); pair with md.charge.pppm "
             "for full electrostatics.")
dpd_conservative = _make_pair_class(
    'dpd_conservative', "Conservative DPD (md/pair.py dpd_conservative).")
moliere = _make_pair_class('moliere', "Moliere screening (md/pair.py).")
zbl = _make_pair_class('zbl', "ZBL screening (md/pair.py zbl).")


class slj(pair):
    """Diameter-shifted LJ (md/pair.py slj): enables the nlist diameter
    shift so large particles get correctly padded cutoffs
    (reference NeighborList 'slj' shift, md/NeighborList.h)."""
    _evaluator = pair_eval.slj

    def __init__(self, r_cut, nlist, d_max=None, name=None):
        pair.__init__(self, r_cut, nlist, name=name)
        nlist.diameter_shift = True
        if d_max is not None:
            nlist.d_max = d_max


class table(Force):
    """Tabulated pair potential (reference md/pair.py table,
    md/TablePotential.h): user supplies V(r), F(r) callables or arrays per
    type pair; evaluated by linear interpolation over ``width`` points —
    the interpolation itself is a vectorized gather+lerp on TPU."""

    def __init__(self, width, nlist, name=None):
        Force.__init__(self, name)
        self._log_base = "pair_table_energy"
        self.width = int(width)
        self.pair_coeff = coeff()
        self._nlist = nlist
        nlist.subscribe(self)
        context.current.system.add_force(self)

    def _rcut_matrix(self, types):
        nt = len(types)
        m = np.zeros((nt, nt))
        for i, a in enumerate(types):
            for j, b in enumerate(types):
                rmax = self.pair_coeff.get(a, b, 'rmax')
                if rmax is None:
                    raise RuntimeError(
                        f"table coefficients missing for {a}-{b}")
                m[i, j] = rmax
        return m

    def _sample(self, a, b):
        func = self.pair_coeff.get(a, b, 'func')
        rmin = self.pair_coeff.get(a, b, 'rmin')
        rmax = self.pair_coeff.get(a, b, 'rmax')
        kwargs = self.pair_coeff.get(a, b, 'coeff') or {}
        r = np.linspace(rmin, rmax, self.width)
        V, F = func(r, rmin, rmax, **kwargs)
        return np.asarray(V), np.asarray(F), rmin, rmax

    def _pack_params(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        dt = system.real_dtype
        nt = len(types)
        V = np.zeros((nt, nt, self.width))
        F = np.zeros((nt, nt, self.width))
        rmin = np.zeros((nt, nt))
        rmax = np.zeros((nt, nt))
        for i, a in enumerate(types):
            for j, b in enumerate(types):
                v, f, r0, r1 = self._sample(a, b)
                V[i, j], F[i, j] = v, f
                rmin[i, j], rmax[i, j] = r0, r1
        return {'V': jnp.asarray(V, dtype=dt), 'F': jnp.asarray(F, dtype=dt),
                'rmin': jnp.asarray(rmin, dtype=dt),
                'rmax': jnp.asarray(rmax, dtype=dt)}

    def _make_compute(self, system):
        import jax.numpy as jnp
        from .._config import PAD_COORD, int_dtype
        width = self.width

        def compute(state, nl, params):
            idt = int_dtype()
            pos, typeid = state.pos, state.typeid
            N, K = nl.idx.shape
            pos_pad = jnp.concatenate(
                [pos, jnp.full((1, 3), PAD_COORD, dtype=pos.dtype)])
            t_pad = jnp.concatenate([typeid, jnp.zeros((1,), dtype=idt)])
            j = nl.idx
            dr = state.box.min_image(pos[:, None, :] - pos_pad[j])
            r = jnp.sqrt(jnp.sum(dr * dr, axis=-1))
            ti, tj = typeid[:, None], t_pad[j]
            rmin = params['rmin'][ti, tj]
            rmax = params['rmax'][ti, tj]
            x = (r - rmin) / (rmax - rmin) * (width - 1)
            x = jnp.clip(x, 0.0, width - 1.000001)
            i0 = x.astype(idt)
            frac = x - i0
            Vt, Ft = params['V'], params['F']
            V = (Vt[ti, tj, i0] * (1 - frac) + Vt[ti, tj, i0 + 1] * frac)
            Fm = (Ft[ti, tj, i0] * (1 - frac) + Ft[ti, tj, i0 + 1] * frac)
            valid = (j < N) & (r >= rmin) & (r < rmax)
            fdivr = jnp.where(valid, Fm / jnp.maximum(r, 1e-9), 0.0)
            e = jnp.where(valid, V, 0.0)
            force = jnp.sum(fdivr[:, :, None] * dr, axis=1)
            pe = 0.5 * jnp.sum(e, axis=1)
            pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
            vir = jnp.stack(
                [0.5 * jnp.sum(fdivr * dr[:, :, a] * dr[:, :, b], axis=1)
                 for a, b in pairs], axis=-1)
            return force, pe, vir
        return compute
