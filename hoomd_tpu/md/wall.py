"""Wall potentials (reference md/wall.py:35-1010, EvaluatorWalls.h,
WallData.h).

Wall geometry groups (spheres / cylinders / planes) paired with any pair
evaluator.  Forces come from the evaluator applied to the distance to each
wall surface, vectorized over (N_particles, N_walls).
"""

from __future__ import annotations

import numpy as np

from .. import context
from ..operation import Force
from ..ops import pair_eval
from ._bonded import type_coeff


class sphere:
    """Spherical wall (reference wall.sphere): inside=True confines
    particles inside."""

    def __init__(self, r=0.0, origin=(0., 0., 0.), inside=True):
        self.r = float(r)
        self.origin = tuple(float(x) for x in origin)
        self.inside = bool(inside)


class cylinder:
    def __init__(self, r=0.0, origin=(0., 0., 0.), axis=(0., 0., 1.),
                 inside=True):
        self.r = float(r)
        self.origin = tuple(float(x) for x in origin)
        n = np.asarray(axis, dtype=float)
        self.axis = tuple(n / np.linalg.norm(n))
        self.inside = bool(inside)


class plane:
    def __init__(self, origin=(0., 0., 0.), normal=(0., 0., 1.),
                 inside=True):
        self.origin = tuple(float(x) for x in origin)
        n = np.asarray(normal, dtype=float)
        self.normal = tuple(n / np.linalg.norm(n))
        self.inside = bool(inside)


class group:
    """Container of wall geometries (reference wall.group)."""

    def __init__(self, *walls):
        self.spheres = []
        self.cylinders = []
        self.planes = []
        for w in walls:
            self.add(w)

    def add(self, w):
        if isinstance(w, sphere):
            self.spheres.append(w)
        elif isinstance(w, cylinder):
            self.cylinders.append(w)
        elif isinstance(w, plane):
            self.planes.append(w)
        else:
            raise TypeError(f"not a wall geometry: {w!r}")

    def add_sphere(self, w):
        self.spheres.append(w)

    def add_cylinder(self, w):
        self.cylinders.append(w)

    def add_plane(self, w):
        self.planes.append(w)


class _wallpotential(Force):
    """Shared wall-force machinery (reference wall.wallpotential).

    Per-type coefficients like the corresponding pair potential plus r_cut /
    r_extrap.  Energy is per-particle; virial contributions from walls are
    external forces and excluded from the pressure virial, matching the
    reference (walls are fixed external objects)."""

    _evaluator = None

    def __init__(self, walls, r_cut=False, name=None):
        Force.__init__(self, name)
        self._log_base = f"external_wall_{type(self).__name__}_energy"
        self.walls = walls
        self.force_coeff = type_coeff()
        self.r_cut = r_cut
        context.current.system.add_force(self)

    def _rcut_matrix(self, types):
        return np.zeros((len(types), len(types)))

    def _pack_params(self, system):
        import jax.numpy as jnp
        ev = self._evaluator
        types = system.particle_types
        names = [n for n in ev.coeff_names]
        self.force_coeff.verify(types, names + ['r_cut'],
                                dict(ev.defaults, r_cut=self.r_cut))
        dt = system.real_dtype
        raw = {}
        for n in names:
            raw[n] = jnp.asarray(
                np.array([float(self.force_coeff.get(
                    t, n, ev.defaults.get(n))) for t in types]), dtype=dt)
        derived = ev.derive(raw)
        rcut = jnp.asarray(
            np.array([float(self.force_coeff.get(t, 'r_cut',
                                                 self.r_cut or 0.0))
                      for t in types]), dtype=dt)

        def geo(ws, attrs):
            return {a: jnp.asarray(np.array([getattr(w, a)
                                             for w in ws], dtype=float)
                                   .reshape(len(ws), -1), dtype=dt)
                    for a in attrs}
        packed = {'tables': derived, 'rcut': rcut,
                  'spheres': geo(self.walls.spheres,
                                 ('r', 'origin', 'inside')),
                  'cylinders': geo(self.walls.cylinders,
                                   ('r', 'origin', 'axis', 'inside')),
                  'planes': geo(self.walls.planes,
                                ('origin', 'normal', 'inside'))}
        return packed

    def _make_compute(self, system):
        import jax.numpy as jnp
        ev = self._evaluator
        n_s = len(self.walls.spheres)
        n_c = len(self.walls.cylinders)
        n_p = len(self.walls.planes)

        def wall_distance_vec(pos, params):
            """Signed distance vectors from each particle to each wall
            surface, stacked (N, n_walls, 3); positive side = allowed."""
            ds = []
            if n_s:
                o = params['spheres']['origin']      # (n_s, 3)
                rad = params['spheres']['r'][:, 0]
                inside = params['spheres']['inside'][:, 0]
                d = pos[:, None, :] - o[None, :, :]
                dist = jnp.linalg.norm(d, axis=-1)
                nhat = d / jnp.maximum(dist, 1e-9)[:, :, None]
                sign = jnp.where(inside > 0, -1.0, 1.0)
                gap = sign * (dist - rad)            # >0 on allowed side
                ds.append(gap[:, :, None] * (sign[None, :, None] * nhat))
            if n_c:
                o = params['cylinders']['origin']
                ax = params['cylinders']['axis']
                rad = params['cylinders']['r'][:, 0]
                inside = params['cylinders']['inside'][:, 0]
                d = pos[:, None, :] - o[None, :, :]
                d_par = jnp.sum(d * ax[None, :, :], axis=-1,
                                keepdims=True) * ax[None, :, :]
                d_perp = d - d_par
                dist = jnp.linalg.norm(d_perp, axis=-1)
                nhat = d_perp / jnp.maximum(dist, 1e-9)[:, :, None]
                sign = jnp.where(inside > 0, -1.0, 1.0)
                gap = sign * (dist - rad)
                ds.append(gap[:, :, None] * (sign[None, :, None] * nhat))
            if n_p:
                o = params['planes']['origin']
                nrm = params['planes']['normal']
                inside = params['planes']['inside'][:, 0]
                sign = jnp.where(inside > 0, 1.0, -1.0)[None, :]
                gap = sign * jnp.sum((pos[:, None, :] - o[None, :, :])
                                     * nrm[None, :, :], axis=-1)
                ds.append(gap[:, :, None]
                          * (sign[:, :, None] * nrm[None, :, :]))
            return jnp.concatenate(ds, axis=1) if ds else None

        def compute(state, nl, params):
            N = state.N
            dt_ = state.pos.dtype
            dvec = wall_distance_vec(state.pos, params)
            if dvec is None:
                z = jnp.zeros((N,), dtype=dt_)
                return (jnp.zeros((N, 3), dtype=dt_), z,
                        jnp.zeros((N, 6), dtype=dt_))
            r2 = jnp.sum(dvec * dvec, axis=-1)       # (N, W)
            gap = jnp.linalg.norm(dvec, axis=-1)
            p = {k: v[state.typeid][:, None]
                 for k, v in params['tables'].items()}
            rc = params['rcut'][state.typeid][:, None]
            if getattr(ev, 'needs_rcut', False):
                p['rcut'] = rc
            if ev.needs_charge:
                p['qiqj'] = state.charge[:, None] ** 2
            if ev.needs_diameter:
                p['delta'] = 0.5 * state.diameter[:, None] - 0.5
            valid = (gap > 0) & (gap < rc) & (rc > 0)
            r2s = jnp.where(valid, jnp.maximum(r2, 1e-12), 1.0)
            fdivr, e = ev.energy_force(r2s, p)
            fdivr = jnp.where(valid, fdivr, 0.0)
            e = jnp.where(valid, e, 0.0)
            force = jnp.sum(fdivr[:, :, None] * dvec, axis=1)
            pe = jnp.sum(e, axis=1)
            return (force.astype(dt_), pe.astype(dt_),
                    jnp.zeros((N, 6), dtype=dt_))
        return compute


def _wall_class(eval_name):
    ev = pair_eval.ALL_EVALUATORS[eval_name]

    class _W(_wallpotential):
        __doc__ = (f"{eval_name} wall potential "
                   f"(reference wall.{eval_name})")
        _evaluator = ev
    _W.__name__ = eval_name
    _W.__qualname__ = eval_name
    return _W


lj = _wall_class('lj')
gauss = _wall_class('gauss')
yukawa = _wall_class('yukawa')
morse = _wall_class('morse')
mie = _wall_class('mie')
slj = _wall_class('slj')
force_shifted_lj = _wall_class('force_shifted_lj')
