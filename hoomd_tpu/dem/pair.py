"""Faceted DEM pair potentials (reference dem/DEM2DForceCompute.h,
dem/DEMEvaluator.h, dem/pair.py:136-249).

2D shapes (rounded polygons): every vertex of shape A interacts with every
edge segment of shape B (and vice versa) through a WCA (or shifted-WCA)
potential of the point-to-segment distance — exactly the reference's
feature-pair decomposition (dem/VertexEdge pairs) with NoFriction.
Forces AND torques come from one autodiff sweep over the half-summed pair
energy, with torques extracted from quaternion gradients.

3D polyhedra (vertex-face + edge-edge features, DEM3DForceCompute.h) are
not yet implemented.
"""

from __future__ import annotations

import numpy as np

from .. import context
from .._config import PAD_COORD, int_dtype
from ..operation import Force


class _dem2d_base(Force):
    is_aniso = True
    _shifted = False

    def __init__(self, nlist, radius=1.0, name=None):
        Force.__init__(self, name)
        self._log_base = f"pair_dem_{type(self).__name__}_energy"
        self.radius = float(radius)
        self._verts = {}
        self._nlist = nlist
        nlist.subscribe(self)
        context.current.system.add_force(self)

    def setParams(self, type_name, vertices):
        """Define the polygon for one type (reference dem.pair WCA.setParams)."""
        v = np.asarray(vertices, dtype=float)
        if v.shape[1] == 2:
            v = np.hstack([v, np.zeros((len(v), 1))])
        self._verts[type_name] = v
        context.current.system._dirty()

    set_params = setParams

    def _max_vr(self, types):
        out = 0.0
        for t in types:
            v = self._verts.get(t)
            if v is not None and len(v):
                out = max(out, float(np.linalg.norm(v, axis=1).max()))
        return out

    def _rcut_matrix(self, types):
        nt = len(types)
        # WCA on feature distance cuts at 2^(1/6) * (2 radius); center
        # distance adds both circumradii
        rc = 2.0 ** (1.0 / 6.0) * 2.0 * self.radius \
            + 2.0 * self._max_vr(types)
        return np.full((nt, nt), rc)

    def _pack_params(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        dt = system.real_dtype
        nv = max((len(v) for v in self._verts.values()), default=1)
        nt = len(types)
        verts = np.zeros((nt, nv, 3))
        counts = np.zeros(nt, dtype=np.int32)
        for i, t in enumerate(types):
            v = self._verts.get(t)
            if v is None or len(v) == 0:
                counts[i] = 1   # point particle at the origin
            else:
                verts[i, :len(v)] = v
                counts[i] = len(v)
        return {'verts': jnp.asarray(verts, dtype=dt),
                'counts': jnp.asarray(counts),
                'radius': jnp.asarray(self.radius, dt)}

    def _make_compute(self, system):
        import jax
        import jax.numpy as jnp
        from ..ops import quat as Q
        shifted = self._shifted

        def wca(d2, sig2):
            s2 = sig2 / jnp.maximum(d2, 1e-12)
            s6 = s2 * s2 * s2
            e = 4.0 * (s6 * s6 - s6) + 1.0
            return jnp.where(s2 > 2.0 ** (-1.0 / 3.0), e, 0.0)

        def point_seg_d2(p, a, b):
            ab = b - a
            denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)
            t = jnp.clip(jnp.sum((p - a) * ab, axis=-1) / denom, 0.0, 1.0)
            d = p - (a + t[..., None] * ab)
            return jnp.sum(d * d, axis=-1)

        def pair_energy(dr, qi, qj, vi_tab, ci, vj_tab, cj, radius):
            """Energy of one (i, j) lane: vertices of i vs edges of j and
            vice versa.  dr = r_i - r_j."""
            NV = vi_tab.shape[-2]
            vi = Q.rotate(qi[..., None, :], vi_tab) + dr[..., None, :]
            vj = Q.rotate(qj[..., None, :], vj_tab)   # j at origin
            kv = jnp.arange(NV)
            mask_i = kv < ci[..., None]
            mask_j = kv < cj[..., None]
            sig2 = (2.0 * radius) ** 2

            def feat(vA, mA, vB, mB, cB):
                # points of A against edges (k, k+1 mod count) of B
                nxt = jnp.where(kv + 1 < cB[..., None], kv + 1, 0)
                b0 = vB
                b1 = jnp.take_along_axis(
                    vB, jnp.broadcast_to(nxt[..., None], vB.shape),
                    axis=-2)
                # single-vertex shapes: the "edge" degenerates to a point
                p = vA[..., :, None, :]
                a = b0[..., None, :, :]
                b = b1[..., None, :, :]
                d2 = point_seg_d2(p, a, b)
                e = wca(d2, sig2)
                m = mA[..., :, None] & mB[..., None, :]
                return jnp.sum(jnp.where(m, e, 0.0), axis=(-1, -2))
            return feat(vi, mask_i, vj, mask_j, cj) \
                + feat(vj, mask_j, vi, mask_i, ci)

        def compute(state, nl, params):
            idt = int_dtype()
            rdt = state.pos.dtype
            N, K = nl.idx.shape
            pos_pad = jnp.concatenate(
                [state.pos, jnp.full((1, 3), PAD_COORD, rdt)])
            t_pad = jnp.concatenate(
                [state.typeid, jnp.zeros((1,), idt)])
            q_pad_arr = jnp.concatenate(
                [state.orientation,
                 jnp.asarray([[1.0, 0, 0, 0]], rdt)])
            j = nl.idx
            dr0 = state.box.min_image(state.pos[:, None, :] - pos_pad[j])
            valid = j < N
            ti = state.typeid
            tj = t_pad[j]
            vi_tab = params['verts'][ti]            # (N, V, 3)
            ci = params['counts'][ti]
            vj_tab = params['verts'][tj]            # (N, K, V, 3)
            cj = params['counts'][tj]

            def total(dr, qi, qj_pad):
                qjl = qj_pad[j]
                e = pair_energy(dr, qi[:, None, :], qjl,
                                vi_tab[:, None], ci[:, None],
                                vj_tab, cj, params['radius'])
                e = jnp.where(valid, e, 0.0)
                return 0.5 * jnp.sum(e), e

            (E, e_lane), grads = jax.value_and_grad(
                total, argnums=(0, 1, 2), has_aux=True)(
                dr0, state.orientation, q_pad_arr)
            g_dr, g_qi, g_qpad = grads
            f_lane = -2.0 * g_dr
            force = jnp.sum(f_lane, axis=1)
            g_q = g_qi + g_qpad[:N]
            # torque from the quaternion gradient:
            # tau = -1/2 vec(g x conj(q))
            tq = -0.5 * Q.multiply(
                g_q, Q.conjugate(state.orientation))[..., 1:]
            pe = 0.5 * jnp.sum(e_lane, axis=1)
            pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
            vir = jnp.stack(
                [0.5 * jnp.sum(f_lane[:, :, a] * dr0[:, :, b], axis=1)
                 for a, b in pairs], axis=-1)
            return (force.astype(rdt), tq.astype(rdt), pe.astype(rdt),
                    vir.astype(rdt))
        return compute


class WCA2D(_dem2d_base):
    """Rounded-polygon WCA DEM (reference dem.pair.WCA in 2D):
    WCA2D(nlist, radius=...); setParams('A', vertices=[(x,y), ...])."""


class SWCA2D(_dem2d_base):
    """Shifted WCA variant (reference dem.pair.SWCA in 2D)."""
    _shifted = True


def WCA(nlist, radius=1.0):
    """Dimension-dispatching constructor (reference dem.pair.WCA)."""
    sys_ = context.current.system
    if sys_.state.box.dimensions == 3:
        raise NotImplementedError(
            "dem.pair.WCA in 3D (vertex-face/edge-edge polyhedra "
            "features) is not yet implemented; 2D polygons are supported")
    return WCA2D(nlist, radius=radius)


def SWCA(nlist, radius=1.0):
    sys_ = context.current.system
    if sys_.state.box.dimensions == 3:
        raise NotImplementedError("dem.pair.SWCA 3D not yet implemented")
    return SWCA2D(nlist, radius=radius)
