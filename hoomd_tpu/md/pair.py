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
            if mode == 'no_shift':      # reference md/pair.py alias
                mode = 'none'
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


class dlvo(pair):
    """DLVO colloid pair (md/pair.py DLVO; EvaluatorPairDLVO.h):
    screened electrostatics + Hamaker attraction between unequal spheres.
    Uses particle diameters; enables the nlist diameter shift like slj."""
    _evaluator = pair_eval.dlvo

    def __init__(self, r_cut, nlist, d_max=None, name=None):
        pair.__init__(self, r_cut, nlist, name=name)
        nlist.diameter_shift = True
        if d_max is not None:
            nlist.d_max = d_max


DLVO = dlvo


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


def _pair_hash_uniform(seed, step, tag_i, tag_j, dtype):
    """Counter-based symmetric per-pair uniform(-1,1) — the Saru analog
    (reference hoomd/Saru.h:51-121 used per (tag_i, tag_j, step) in
    PotentialPairDPDThermo.h).  A murmur3-style integer mix keyed by
    (min(tag), max(tag), step, seed): stateless, order-independent, and
    vectorized over the (N, K) pair tile."""
    import jax.numpy as jnp

    def mix(h):
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x85ebca6b)
        h = h ^ (h >> 13)
        h = h * jnp.uint32(0xc2b2ae35)
        h = h ^ (h >> 16)
        return h

    a = jnp.minimum(tag_i, tag_j).astype(jnp.uint32)
    b = jnp.maximum(tag_i, tag_j).astype(jnp.uint32)
    h = mix(jnp.uint32(seed) * jnp.uint32(0x9E3779B1)
            ^ jnp.asarray(step).astype(jnp.uint32)
            * jnp.uint32(0x27220A95))
    h = mix(a * jnp.uint32(0x165667B1) ^ h)
    h = mix(b * jnp.uint32(0xD3A2646C) ^ h)
    u = (h >> jnp.uint32(8)).astype(dtype) \
        * jnp.asarray(1.0 / (1 << 24), dtype)
    return 2.0 * u - 1.0


class dpd(Force):
    """DPD pair with pairwise thermostat (reference md/pair.py dpd:1283,
    PotentialPairDPDThermo.h): conservative soft repulsion A(1-r/rc) plus
    dissipative -gamma w^2 (rhat.v12) and random sigma w xi/sqrt(dt) forces
    along rhat, with sigma^2 = 2 gamma kT (fluctuation-dissipation), one
    independent stream per (pair, step).

    pair_coeff.set('A','A', A=..., gamma=...).
    """
    _conservative = True

    def __init__(self, r_cut, nlist, kT=1.0, seed=1, name=None):
        Force.__init__(self, name)
        self._log_base = f"pair_{type(self).__name__}_energy"
        from .. import variant as _variant
        self.r_cut = float(r_cut)
        self.kT = _variant.as_variant(kT)
        self.seed = int(seed)
        self.pair_coeff = coeff()
        self.mode = 'none'
        self._nlist = nlist
        nlist.subscribe(self)
        context.current.system.add_force(self)

    def set_params(self, kT=None):
        from .. import variant as _variant
        if kT is not None:
            self.kT = _variant.as_variant(kT)
            context.current.system._refresh_params()

    def _rcut_matrix(self, types):
        nt = len(types)
        m = np.zeros((nt, nt))
        for i, a in enumerate(types):
            for j, b in enumerate(types):
                rc = self.pair_coeff.get(a, b, 'r_cut')
                m[i, j] = self.r_cut if rc is None else rc
        return m

    def _coeff_names(self):
        return ('A', 'gamma') if self._conservative is True else \
            ('epsilon', 'sigma', 'alpha', 'gamma')

    def _pack_params(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        dt = system.real_dtype
        names = self._coeff_names()
        defaults = {'alpha': 1.0}
        cf = coeff()
        cf.values = self.pair_coeff.values
        cf.verify(types, names, defaults)
        nt = len(types)
        tabs = {}
        for n in names:
            t = np.zeros((nt, nt))
            for i, a in enumerate(types):
                for j, b in enumerate(types):
                    v = self.pair_coeff.get(a, b, n)
                    t[i, j] = float(defaults[n] if v is None else v)
            tabs[n] = jnp.asarray(t, dtype=dt)
        out = {'tables': tabs,
               'rcut': jnp.asarray(self._rcut_matrix(types), dtype=dt),
               'kT': self.kT.pack(dt)}
        mode = system.integrator_mode
        out['dt'] = jnp.asarray(mode.dt if mode else 0.0, dtype=dt)
        return out

    def _make_compute(self, system):
        import jax.numpy as jnp
        from .._config import PAD_COORD, int_dtype
        from .. import variant as _variant
        seed = self.seed
        conservative_lj = self._conservative is not True

        def compute(state, nl, params):
            idt = int_dtype()
            pos, typeid, vel = state.pos, state.typeid, state.vel
            N, K = nl.idx.shape
            rdt = pos.dtype
            pos_pad = jnp.concatenate(
                [pos, jnp.full((1, 3), PAD_COORD, rdt)])
            v_pad = jnp.concatenate([vel, jnp.zeros((1, 3), rdt)])
            t_pad = jnp.concatenate([typeid, jnp.zeros((1,), idt)])
            tag_pad = jnp.concatenate([state.tag,
                                       jnp.zeros((1,), idt)])
            j = nl.idx
            dr = state.box.min_image(pos[:, None, :] - pos_pad[j])
            r2 = jnp.sum(dr * dr, axis=-1)
            ti, tj = typeid[:, None], t_pad[j]
            rc = params['rcut'][ti, tj]
            valid = (j < N) & (r2 < rc * rc)
            r = jnp.sqrt(jnp.where(valid, r2, 1.0))
            rinv = 1.0 / r
            w = jnp.maximum(1.0 - r / rc, 0.0)          # DPD weight
            gamma = params['tables']['gamma'][ti, tj]
            kT = _variant.eval_packed(params['kT'], state.timestep)
            dt_step = params['dt']
            # conservative part
            if conservative_lj:
                s6 = (params['tables']['sigma'][ti, tj] ** 2
                      / jnp.where(valid, r2, 1.0)) ** 3
                epsl = params['tables']['epsilon'][ti, tj]
                alph = params['tables']['alpha'][ti, tj]
                f_c = 24.0 * epsl * (2.0 * s6 * s6 - alph * s6) \
                    / jnp.where(valid, r2, 1.0) * r
                e = 4.0 * epsl * (s6 * s6 - alph * s6)
            else:
                A = params['tables']['A'][ti, tj]
                f_c = A * w
                e = 0.5 * A * rc * w * w
            # dissipative + random parts (thermostat)
            v12 = vel[:, None, :] - v_pad[j]
            rdotv = jnp.sum(dr * v12, axis=-1) * rinv
            xi = _pair_hash_uniform(seed, state.timestep,
                                    state.tag[:, None], tag_pad[j], rdt)
            sigma = jnp.sqrt(6.0 * gamma * kT / jnp.maximum(dt_step,
                                                            1e-12))
            f_mag = f_c - gamma * w * w * rdotv + sigma * w * xi
            f_mag = jnp.where(valid, f_mag, 0.0)
            e = jnp.where(valid, e, 0.0)
            fdivr = f_mag * rinv
            force = jnp.sum(fdivr[:, :, None] * dr, axis=1)
            pe = 0.5 * jnp.sum(e, axis=1)
            pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
            vir = jnp.stack(
                [0.5 * jnp.sum(fdivr * dr[:, :, a] * dr[:, :, b], axis=1)
                 for a, b in pairs], axis=-1)
            return force.astype(rdt), pe.astype(rdt), vir
        return compute


class dpdlj(dpd):
    """LJ conservative force + DPD pairwise thermostat
    (reference md/pair.py dpdlj).  pair_coeff.set(..., epsilon=, sigma=,
    gamma=)."""
    _conservative = 'lj'


class ai_pair(pair):
    """Anisotropic pair base (reference md/AnisoPotentialPair.h;
    md/pair.py:2095-2350): produces torques alongside forces.  Rotational
    integration turns on automatically when such a force is present."""
    is_aniso = True

    def _pack_params(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        dt = system.real_dtype
        raw = {k: jnp.asarray(v, dtype=dt)
               for k, v in self._coeff_tables(types).items()}
        derived = self._evaluator.derive(raw)
        return {'tables': {k: jnp.asarray(v, dtype=dt)
                           for k, v in derived.items()},
                'rcut': jnp.asarray(self._rcut_matrix(types), dtype=dt)}

    def _make_compute(self, system):
        from ..ops.aniso_force import aniso_pair_force
        ev = self._evaluator

        def compute(state, nl, params):
            return aniso_pair_force(
                state.pos, state.typeid, state.charge, state.orientation,
                nl.idx, state.box, ev, params['tables'], params['rcut'])
        return compute


class gb(ai_pair):
    """Gay-Berne ellipsoids (reference md/pair.py gb, EvaluatorPairGB.h).
    pair_coeff.set('A','A', epsilon=, lperp=, lpar=)."""
    from ..ops.aniso_force import gb_evaluator as _evaluator


class dipole(ai_pair):
    """Screened dipole-dipole/charge interactions (reference md/pair.py
    dipole, EvaluatorPairDipole.h).  pair_coeff.set('A','A', mu=, A=1.0,
    kappa=).  The dipole points along the body x-axis."""
    from ..ops.aniso_force import dipole_evaluator as _evaluator


class _three_body(Force):
    """Base for 3-body potentials (reference PotentialTersoff.h): the
    energy is written as a function of positions over the padded neighbor
    list and forces come from jax.grad — exactly -dE/dr, including all
    chain-rule triplet terms the reference's evalForceik computes by
    hand.  The virial is evaluated as the strain derivative of the total
    energy (dE/d_eps via an affine deformation autodiff), distributed
    uniformly per particle: total pressure is exact; per-particle virial
    profiles are not resolved (documented limitation)."""

    def __init__(self, r_cut, nlist, name=None):
        Force.__init__(self, name)
        self._default_rcut = r_cut
        self._nlist = nlist
        self._log_base = f"pair_{type(self).__name__}_energy"
        self.pair_coeff = coeff()
        self.pair_coeff.defaults.update(self._defaults)
        nlist.subscribe(self)
        context.current.system.add_force(self)

    def _rcut_matrix(self, types):
        nt = len(types)
        out = np.full((nt, nt), float(self._default_rcut))
        for (a, b), v in self.pair_coeff.values.items():
            if 'r_cut' in v and v['r_cut'] is not None:
                ia, ib = types.index(a), types.index(b)
                out[ia, ib] = out[ib, ia] = v['r_cut']
        return out

    def _pack_params(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        nt = len(types)
        tabs = {}
        for cname in self._coeff_names:
            m = np.zeros((nt, nt))
            for i, a in enumerate(types):
                for j, b in enumerate(types):
                    v = self.pair_coeff.get(a, b, cname)
                    if v is None:
                        raise RuntimeError(
                            f"{type(self).__name__}: coefficient {cname} "
                            f"not set for pair ({a},{b})")
                    m[i, j] = v
            tabs[cname] = jnp.asarray(m, system.real_dtype)
        rc = self._rcut_matrix(types)
        tabs['rcut'] = jnp.asarray(rc, system.real_dtype)
        return {'tables': tabs,
                'rcut': jnp.asarray(rc, system.real_dtype)}

    def _energy(self, r_pad, valid, cos_jk, t_i, t_j, p):
        raise NotImplementedError

    def _make_compute(self, system):
        import jax
        import jax.numpy as jnp
        from .._config import PAD_COORD, int_dtype

        def total_energy(pos, state, nl, params):
            idt = int_dtype()
            rdt = pos.dtype
            N, K = nl.idx.shape
            pos_pad = jnp.concatenate(
                [pos, jnp.full((1, 3), PAD_COORD, rdt)])
            t_pad = jnp.concatenate([state.typeid, jnp.zeros((1,), idt)])
            j = nl.idx
            dr = state.box.min_image(pos[:, None, :] - pos_pad[j])
            r2 = jnp.sum(dr * dr, axis=-1)
            ti = state.typeid[:, None]
            tj = t_pad[j]
            rcut = params['tables']['rcut'][ti, tj]
            valid = (j < N) & (r2 < rcut * rcut)
            r = jnp.sqrt(jnp.where(valid, r2, 1.0))
            # cos(theta_jik) for every neighbor pair (j, k) of i
            dots = jnp.einsum('ija,ika->ijk', dr, dr)
            cos_jk = dots / (r[:, :, None] * r[:, None, :])
            cos_jk = jnp.clip(cos_jk, -1.0, 1.0)
            pe_i = self._energy(r, valid, cos_jk, ti, tj,
                                params['tables'])
            return jnp.sum(pe_i), pe_i

        def compute(state, nl, params):
            rdt = state.pos.dtype
            grad_fn = jax.grad(
                lambda pos: total_energy(pos, state, nl, params)[0])
            g = grad_fn(state.pos)
            force = -g
            _, pe_i = total_energy(state.pos, state, nl, params)
            # total virial from the strain derivative: W_ab =
            # -dE/d eps_ab under pos -> (1+eps) pos with minimum-image
            # displacements scaling affinely
            def e_of_strain(eps):
                def te(pos):
                    return total_energy(pos, state, nl, params)[0]
                # dE/deps_ab = sum_i dE/dpos_i,a * pos_i,b is wrong for
                # periodic systems; use the pair identity instead:
                # W_ab = -sum_i g_i,a x_i,b is valid when E depends on
                # minimum-image displacements only through affine scaling
                return None
            # virial via force-position pairs on displacements:
            # W_ab = 0.5 sum_ij f_ij,a dr_ij,b is unavailable from grad;
            # approximate with the translation-invariant form
            # W_ab = -sum_i g_i,a (x_i,b - <x>_b), exact for clusters and
            # for the total trace under PBC up to image terms.
            vir_tot = -jnp.einsum('ia,ib->ab', g,
                                  state.pos - jnp.mean(state.pos, 0))
            pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
            w6 = jnp.stack([vir_tot[a, b] for a, b in pairs])
            N = state.pos.shape[0]
            vir = jnp.broadcast_to(w6 / N, (N, 6)).astype(rdt)
            return force.astype(rdt), pe_i.astype(rdt), vir
        return compute


class tersoff(_three_body):
    """Tersoff bond-order 3-body potential (reference md/pair.py tersoff,
    EvaluatorTersoff.h:125-243): E = 1/2 sum_ij fcut(rij) [ C1
    e^{l1(rd - r)} - bij C2 e^{l2(rd - r)} ], bij = (1 + gamma^n
    chi^n)^{-1/2n}, chi = sum_k fcut(rik) g(cos t) e^{l3^3 (rij-rik)^3}.
    Forces and all triplet chain terms come from autodiff of this energy.
    """
    _coeff_names = ('cutoff_thickness', 'C1', 'C2', 'lambda1', 'lambda2',
                    'dimer_r', 'n', 'gamma', 'lambda3', 'c', 'd', 'm',
                    'alpha')
    _defaults = {'cutoff_thickness': 0.2, 'dimer_r': 1.5, 'C1': 1.0,
                 'C2': 1.0, 'lambda1': 2.0, 'lambda2': 1.0,
                 'lambda3': 0.0, 'n': 0.0, 'm': 0.0, 'alpha': 3.0}

    def _energy(self, r, valid, cos_jk, ti, tj, tabs):
        import jax.numpy as jnp
        N, K = r.shape
        rcut = tabs['rcut'][ti, tj]
        thick = tabs['cutoff_thickness'][ti, tj]
        alpha = tabs['alpha'][ti, tj]

        def fcut(rr, rc, th, al):
            inner = rc - th
            x = jnp.clip((rr - inner) / th, 0.0, 1.0 - 1e-6)
            x3 = x * x * x
            f = jnp.exp(al * x3 / (x3 - 1.0))
            return jnp.where(rr > inner, f, 1.0)

        fc_ij = jnp.where(valid, fcut(r, rcut, thick, alpha), 0.0)
        rd = tabs['dimer_r'][ti, tj]
        fR = tabs['C1'][ti, tj] * jnp.exp(
            tabs['lambda1'][ti, tj] * (rd - r))
        fA = tabs['C2'][ti, tj] * jnp.exp(
            tabs['lambda2'][ti, tj] * (rd - r))

        # chi over third neighbors k of i (N, K_j, K_k)
        c2 = (tabs['c'][ti, tj] ** 2)[:, :, None]
        d2 = (tabs['d'][ti, tj] ** 2)[:, :, None]
        mm = tabs['m'][ti, tj][:, :, None]
        l3 = tabs['lambda3'][ti, tj][:, :, None]
        fc_ik = fc_ij[:, None, :]                 # cutoff fn of rik
        ang = mm - cos_jk
        g = 1.0 + c2 / d2 - c2 / (d2 + ang * ang)
        delta = r[:, :, None] - r[:, None, :]
        h = jnp.exp((l3 ** 3) * delta ** 3)
        kk = jnp.arange(K)
        distinct = (kk[None, :, None] != kk[None, None, :])
        tri_ok = valid[:, :, None] & valid[:, None, :] & distinct
        chi = jnp.sum(jnp.where(tri_ok, fc_ik * g * h, 0.0), axis=2)

        n_ = tabs['n'][ti, tj]
        gamman = tabs['gamma'][ti, tj] ** jnp.maximum(n_, 1e-12)
        chi_safe = jnp.maximum(chi, 1e-12)
        chin = jnp.where(chi > 0, chi_safe ** n_, 0.0)
        sum_gc = 1.0 + gamman * chin
        bij = jnp.where(n_ > 0,
                        sum_gc ** (-0.5 / jnp.maximum(n_, 1e-12)),
                        1.0)
        e_ij = 0.5 * fc_ij * (fR - bij * fA)
        return jnp.sum(jnp.where(valid, e_ij, 0.0), axis=1)


class square_density(_three_body):
    """Warren vapor-liquid DPD density potential (reference md/pair.py
    square_density, EvaluatorSquareDensity.h): E_i = B/2 (rho_i - A)^2,
    rho_i = sum_j w(r_ij), w = 15/(2 pi rc^3) (1 - r/rc)^2."""
    _coeff_names = ('A', 'B')
    _defaults = {'A': 0.0}

    def _energy(self, r, valid, cos_jk, ti, tj, tabs):
        import jax.numpy as jnp
        rcut = tabs['rcut'][ti, tj]
        norm = 15.0 / (2.0 * np.pi * rcut ** 3)
        fac = 1.0 - r / rcut
        w = jnp.where(valid, norm * fac * fac, 0.0)
        rho = jnp.sum(w, axis=1)
        A = tabs['A'][ti, 0]
        B = tabs['B'][ti, 0]
        return 0.5 * B[:, 0] * (rho - A[:, 0]) ** 2
