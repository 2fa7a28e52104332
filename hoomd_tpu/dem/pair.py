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


class _dem3d_base(Force):
    """Faceted 3D DEM (reference dem/DEM3DForceCompute.h): every vertex
    of shape A interacts with every face of shape B (point-to-polygon
    distance = min over the face's triangle fan) and every edge of A with
    every edge of B (segment-segment distance), each through WCA on the
    feature distance — the same potential the reference sums per feature
    pair.  Forces/torques via autodiff like the 2D variant."""
    _shifted = False

    def __init__(self, nlist, radius=1.0, name=None):
        Force.__init__(self, name)
        self._log_base = 'pair_dem_energy'
        self.radius = float(radius)
        self._shapes = {}
        self._nlist = nlist
        self.is_aniso = True
        nlist.subscribe(self)
        context.current.system.add_force(self)

    def setParams(self, type_name, vertices, faces=None):
        """vertices [(x,y,z)...]; faces: list of vertex-index loops.
        If faces is None the convex hull supplies them."""
        v = np.asarray(vertices, dtype=float).reshape(-1, 3)
        if faces is None and len(v) >= 4:
            from scipy.spatial import ConvexHull
            hull = ConvexHull(v)
            tris = hull.simplices
            # merge coplanar hull triangles into polygonal faces
            norms = []
            for t in tris:
                n = np.cross(v[t[1]] - v[t[0]], v[t[2]] - v[t[0]])
                n /= max(np.linalg.norm(n), 1e-12)
                off = np.dot(n, v[t[0]])
                if off < 0:
                    n, off = -n, -off
                norms.append((tuple(np.round(n, 6)), round(off, 6), t))
            groups = {}
            for n, off, t in norms:
                groups.setdefault((n, off), []).extend(t)
            # keep the plane normal with each face for robust loop
            # ordering (the fan-sum normal of an UNORDERED vertex list
            # can cancel to zero)
            faces = [(sorted(set(g)), np.asarray(key[0]))
                     for key, g in groups.items()]
        elif faces is None:
            faces = [(list(range(len(v))), None)]
        else:
            faces = [(list(f), None) for f in faces]
        self._shapes[type_name] = {'verts': v, 'faces': faces}
        context.current.system._dirty()

    def _rcut_matrix(self, types):
        vr = np.zeros(len(types))
        for i, t in enumerate(types):
            sh = self._shapes.get(t)
            r = np.linalg.norm(sh['verts'], axis=1).max() if sh else 0.0
            vr[i] = r
        rc = 2.0 ** (1.0 / 6.0) * (2.0 * self.radius)
        return vr[:, None] + vr[None, :] + rc

    def _pack_params(self, system):
        import jax.numpy as jnp
        types = system.particle_types
        dt = system.real_dtype
        FAR = 1e6
        NVm = max(len(self._shapes[t]['verts']) for t in types
                  if t in self._shapes)
        # triangle-fan and edge tables, padded with far-away dummies
        tri_list, edge_list = [], []
        NFm = TFm = NEm = 1
        per_type = []
        for t in types:
            sh = self._shapes.get(t)
            if sh is None:
                per_type.append(([], []))
                continue
            v, faces = sh['verts'], sh['faces']
            tris = []       # (face, tri) -> 3 coords
            edges = set()
            for f, n_face in faces:
                # order the face loop by angle around its centroid
                fv = v[np.asarray(f)]
                c = fv.mean(axis=0)
                if n_face is not None:
                    n = np.asarray(n_face, float)
                else:
                    n = np.zeros(3)
                    for k in range(1, len(f) - 1):
                        n = n + np.cross(fv[k] - fv[0],
                                         fv[k + 1] - fv[0])
                n /= max(np.linalg.norm(n), 1e-12)
                ref = fv[0] - c
                ref -= n * np.dot(ref, n)
                ref /= max(np.linalg.norm(ref), 1e-12)
                t2 = np.cross(n, ref)
                ang = np.arctan2(fv @ t2 - c @ t2, fv @ ref - c @ ref)
                order = [f[k] for k in np.argsort(ang)]
                fan = [(order[0], order[k], order[k + 1])
                       for k in range(1, len(order) - 1)]
                tris.append([(v[a], v[b], v[c2]) for a, b, c2 in fan])
                for k in range(len(order)):
                    e = (min(order[k], order[(k + 1) % len(order)]),
                         max(order[k], order[(k + 1) % len(order)]))
                    edges.add(e)
            edges = [(v[a], v[b]) for a, b in sorted(edges)]
            per_type.append((tris, edges))
            NFm = max(NFm, len(tris))
            TFm = max(TFm, max((len(x) for x in tris), default=1))
            NEm = max(NEm, len(edges))
        nt = len(types)
        V = np.full((nt, NVm, 3), FAR)
        CV = np.zeros(nt, np.int32)
        TRI = np.full((nt, NFm, TFm, 3, 3), FAR)
        ED = np.full((nt, NEm, 2, 3), FAR)
        for i, t in enumerate(types):
            sh = self._shapes.get(t)
            if sh is None:
                continue
            vv = sh['verts']
            V[i, :len(vv)] = vv
            CV[i] = len(vv)
            tris, edges = per_type[i]
            for fi, fan in enumerate(tris):
                for ti_, coords in enumerate(fan):
                    TRI[i, fi, ti_] = np.asarray(coords)
            for ei, (a, b) in enumerate(edges):
                ED[i, ei, 0] = a
                ED[i, ei, 1] = b
        return {'verts': jnp.asarray(V, dt),
                'tri': jnp.asarray(TRI, dt),
                'edge': jnp.asarray(ED, dt),
                'radius': jnp.asarray(self.radius, dt)}

    def _make_compute(self, system):
        import jax
        import jax.numpy as jnp
        from ..ops import quat as Q

        def wca(d2, sig2):
            # the deep-overlap clamp keeps s6^2 finite in f32 (gradients
            # stay huge-but-finite so integration errors surface as
            # energy blowup, not NaN)
            s2 = sig2 / jnp.maximum(d2, 1e-4 * sig2)
            s6 = s2 * s2 * s2
            e = 4.0 * (s6 * s6 - s6) + 1.0
            return jnp.where(s2 > 2.0 ** (-1.0 / 3.0), e, 0.0)

        def point_tri_d2(p, a, b, c):
            """Point-triangle squared distance: plane projection when the
            foot is inside (barycentric test), else min over the three
            edge segments.  Degenerate (zero-area) triangles — the FAR
            padding slots — must NOT take the plane branch: their n = 0
            makes dplane/nn = 0 look like contact."""
            n = jnp.cross(b - a, c - a)
            nn_raw = jnp.sum(n * n, -1)
            nn = jnp.maximum(nn_raw, 1e-12)
            scale = jnp.maximum(jnp.sum((b - a) ** 2, -1)
                                * jnp.sum((c - a) ** 2, -1), 1e-12)
            dplane = jnp.sum((p - a) * n, -1)
            foot = p - (dplane / nn)[..., None] * n
            s1 = jnp.sum(jnp.cross(b - foot, c - foot) * n, -1)
            s2 = jnp.sum(jnp.cross(c - foot, a - foot) * n, -1)
            s3 = jnp.sum(jnp.cross(a - foot, b - foot) * n, -1)
            inside = (s1 >= 0) & (s2 >= 0) & (s3 >= 0) \
                & (nn_raw > 1e-10 * scale)

            def seg_d2(p, u, w):
                uw = w - u
                tt = jnp.clip(jnp.sum((p - u) * uw, -1)
                              / jnp.maximum(jnp.sum(uw * uw, -1), 1e-12),
                              0.0, 1.0)
                d = p - (u + tt[..., None] * uw)
                return jnp.sum(d * d, -1)
            d_edge = jnp.minimum(seg_d2(p, a, b),
                                 jnp.minimum(seg_d2(p, b, c),
                                             seg_d2(p, c, a)))
            d_pl = dplane * dplane / nn
            return jnp.where(inside, d_pl, d_edge)

        def seg_seg_d2(p1, q1, p2, q2):
            """Segment-segment squared distance (Ericson 5.1.9 style,
            branch-free with clamped re-projection)."""
            d1 = q1 - p1
            d2 = q2 - p2
            r = p1 - p2
            a = jnp.maximum(jnp.sum(d1 * d1, -1), 1e-12)
            e = jnp.maximum(jnp.sum(d2 * d2, -1), 1e-12)
            f = jnp.sum(d2 * r, -1)
            c = jnp.sum(d1 * r, -1)
            b = jnp.sum(d1 * d2, -1)
            den = jnp.maximum(a * e - b * b, 1e-12)
            s = jnp.clip((b * f - c * e) / den, 0.0, 1.0)
            t = (b * s + f) / e
            t_cl = jnp.clip(t, 0.0, 1.0)
            s = jnp.clip((b * t_cl - c) / a, 0.0, 1.0)
            w = (p1 + s[..., None] * d1) - (p2 + t_cl[..., None] * d2)
            return jnp.sum(w * w, -1)

        def pair_energy(dr, qi, qj, Vi, TRi, EDi, Vj, TRj, EDj, radius):
            """dr = r_i - r_j; all shape tables already type-gathered."""
            sig2 = (2.0 * radius) ** 2

            # rotate: broadcast quats over the trailing table dims
            def rot(q, x):
                extra = x.ndim - q.ndim
                qq = q.reshape(q.shape[:-1] + (1,) * extra + (4,))
                return Q.rotate(qq, x)
            vi = rot(qi, Vi) + dr[..., None, :]
            tri_j = rot(qj, TRj)
            # vertices of i vs faces of j: (..., V, F, TF)
            p = vi[..., :, None, None, :]
            d2_vf = point_tri_d2(p, tri_j[..., None, :, :, 0, :],
                                 tri_j[..., None, :, :, 1, :],
                                 tri_j[..., None, :, :, 2, :])
            d2_face = jnp.min(d2_vf, axis=-1)        # min over fan
            e_vf = jnp.sum(wca(d2_face, sig2), axis=(-1, -2))
            # vertices of j vs faces of i
            vj = rot(qj, Vj)
            tri_i = rot(qi, TRi) + dr[..., None, None, None, :]
            p2 = vj[..., :, None, None, :]
            d2_vf2 = point_tri_d2(p2, tri_i[..., None, :, :, 0, :],
                                  tri_i[..., None, :, :, 1, :],
                                  tri_i[..., None, :, :, 2, :])
            e_fv = jnp.sum(wca(jnp.min(d2_vf2, -1), sig2), axis=(-1, -2))
            # edges of i vs edges of j
            ei = rot(qi, EDi) + dr[..., None, None, :]
            ej = rot(qj, EDj)
            d2_ee = seg_seg_d2(ei[..., :, None, 0, :],
                               ei[..., :, None, 1, :],
                               ej[..., None, :, 0, :],
                               ej[..., None, :, 1, :])
            e_ee = jnp.sum(wca(d2_ee, sig2), axis=(-1, -2))
            return e_vf + e_fv + e_ee

        def compute(state, nl, params):
            idt = int_dtype()
            rdt = state.pos.dtype
            N, K = nl.idx.shape
            pos_pad = jnp.concatenate(
                [state.pos, jnp.full((1, 3), PAD_COORD, rdt)])
            t_pad = jnp.concatenate(
                [state.typeid, jnp.zeros((1,), idt)])
            q_pad_arr = jnp.concatenate(
                [state.orientation, jnp.asarray([[1.0, 0, 0, 0]], rdt)])
            j = nl.idx
            dr0 = state.box.min_image(state.pos[:, None, :] - pos_pad[j])
            valid = j < N
            ti = state.typeid
            tj = t_pad[j]

            def total(dr, qi, qj_pad):
                qjl = qj_pad[j]
                e = pair_energy(
                    dr, qi[:, None, :], qjl,
                    params['verts'][ti][:, None],
                    params['tri'][ti][:, None],
                    params['edge'][ti][:, None],
                    params['verts'][tj], params['tri'][tj],
                    params['edge'][tj], params['radius'])
                e = jnp.where(valid, e, 0.0)
                return 0.5 * jnp.sum(e), e

            (E, e_lane), grads = jax.value_and_grad(
                total, argnums=(0, 1, 2), has_aux=True)(
                dr0, state.orientation, q_pad_arr)
            g_dr, g_qi, g_qpad = grads
            f_lane = -2.0 * g_dr
            force = jnp.sum(f_lane, axis=1)
            g_q = g_qi + g_qpad[:N]
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


class WCA3D(_dem3d_base):
    """Faceted-polyhedron WCA DEM (reference dem.pair.WCA in 3D)."""


class SWCA3D(_dem3d_base):
    _shifted = True


def WCA(nlist, radius=1.0):
    """Dimension-dispatching constructor (reference dem.pair.WCA)."""
    sys_ = context.current.system
    if sys_.state.box.dimensions == 3:
        return WCA3D(nlist, radius=radius)
    return WCA2D(nlist, radius=radius)


def SWCA(nlist, radius=1.0):
    sys_ = context.current.system
    if sys_.state.box.dimensions == 3:
        return SWCA3D(nlist, radius=radius)
    return SWCA2D(nlist, radius=radius)
