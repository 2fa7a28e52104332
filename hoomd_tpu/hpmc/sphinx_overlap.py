"""Sphinx (sphere-intersection) overlap predicates, vectorized.

The reference implements sphinx–sphinx overlap through E. R. Chen's
sphere-arrangement separation algebra (reference hpmc/SphinxOverlap.h,
hpmc/ShapeSphinx.h:181-370): the two shapes (each an intersection of
positive balls and complements of negative balls) are disjoint iff some
small subset of the combined sphere set carries a separation
certificate ``seqM`` — a closed-form sign condition on the pairwise
squared distances and signed squared radii.  In 3D with the shapes'
``convex`` flag set (always true in the reference constructor,
ShapeSphinx.h:86), the cascade truncates at subsets of size 4
(SphinxOverlap.h:662-760: sep5/sep6 fall through to ``return false``
after their seq2/seq3/seq4 sweeps when ``convex && DIM == 3``).

The TPU redesign drops the reference's per-(p.n, q.n) branch ladder and
its ``disjoint`` special case entirely: one uniform rule — overlap iff
NO subset of size 2, 3 or 4 of the union certifies separation — runs as
dense masked tensor ops over statically enumerated subsets, batched
over all trial pairs at once.  The sign guards inside seq2/seq3/seq4
make infeasible subset types (e.g. two negative spheres) self-killing,
so no subset filtering is needed beyond the padding mask.
"""

from __future__ import annotations

import itertools

import numpy as np

EPS = 1e-12   # reference SphinxOverlap.h:51


def seq2(as_, bs, ar, br, ab):
    """Separation certificate for a sphere pair (SphinxOverlap.h:580).

    All args elementwise arrays: signs (+-1), squared radii, squared
    center distance.  True where the two (signed) spheres certify that
    the full arrangement is empty/disjoint.
    """
    import jax.numpy as jnp
    g1 = as_ * (ab + br - ar) >= -EPS
    g2 = bs * (ab + ar - br) >= -EPS
    expr = (ab * (ar + br - ab) + ar * (ab + br - ar)
            + br * (ab + ar - br)) <= 0.0
    return g1 & g2 & expr


def seq3(as_, bs, cs, ar, br, cr, ab, ac, bc):
    """Sphere-triple separation certificate (SphinxOverlap.h:590)."""
    import jax.numpy as jnp
    g1 = as_ * (bc * (ab + ac - bc + br + cr - ar - ar)
                - (ab - ac) * (br - cr)) >= -EPS
    g2 = bs * (ac * (ab + bc - ac + ar + cr - br - br)
               - (ab - bc) * (ar - cr)) >= -EPS
    g3 = cs * (ab * (ac + bc - ab + ar + br - cr - cr)
               - (ac - bc) * (ar - br)) >= -EPS
    expr = (2 * (bc * ar * (ab + ac - bc + br + cr - ar)
                 + ac * br * (ab + bc - ac + ar + cr - br)
                 + ab * cr * (ac + bc - ab + ar + br - cr))
            - (bc + ar) * (ac + br) * (ab + cr)
            - (bc - ar) * (ac - br) * (ab - cr)) <= EPS
    return g1 & g2 & g3 & expr


def _vok4(ab, ac, ad, ae, bc, bd, be, cd, ce, de):
    """Cayley–Menger-type 4+radius form (SphinxOverlap.h:76-110)."""
    abcd = ab * cd; acbd = ac * bd; adbc = ad * bc
    abce = ab * ce; acbe = ac * be; aebc = ae * bc
    abde = ab * de; adbe = ad * be; aebd = ae * bd
    acde = ac * de; adce = ad * ce; aecd = ae * cd
    bcde = bc * de; bdce = bd * ce; becd = be * cd

    Qabcd = acbd + adbc - abcd; Qacbd = abcd + adbc - acbd
    Qadbc = abcd + acbd - adbc
    Qabce = acbe + aebc - abce; Qacbe = abce + aebc - acbe
    Qaebc = abce + acbe - aebc
    Qabde = adbe + aebd - abde; Qadbe = abde + aebd - adbe
    Qaebd = abde + adbe - aebd
    Qacde = adce + aecd - acde; Qadce = acde + aecd - adce
    Qaecd = acde + adce - aecd
    Qbcde = bdce + becd - bcde; Qbdce = bcde + becd - bdce
    Qbecd = bcde + bdce - becd

    return (
        + abcd * (Qabce + Qabde + Qaecd + Qbecd - Qabcd
                  - 4 * (ae * be + ce * de))
        + acbd * (Qacbe + Qaebd + Qacde + Qbdce - Qacbd
                  - 4 * (ae * ce + be * de))
        + adbc * (Qaebc + Qadbe + Qadce + Qbcde - Qadbc
                  - 4 * (ae * de + be * ce))
        + abce * (Qabcd + Qabde + Qadce + Qbdce - Qabce - 4 * ad * bd)
        + acbe * (Qacbd + Qadbe + Qacde + Qbecd - Qacbe - 4 * ad * cd)
        + aebc * (Qadbc + Qaebd + Qaecd + Qbcde - Qaebc - 4 * bd * cd)
        + abde * (Qabcd + Qabce + Qacde + Qbcde - Qabde - 4 * ac * bc)
        + adbe * (Qadbc + Qacbe + Qadce + Qbecd - Qadbe)
        + aebd * (Qacbd + Qaebc + Qaecd + Qbdce - Qaebd)
        + acde * (Qacbd + Qacbe + Qabde + Qbcde - Qacde)
        + adce * (Qadbc + Qabce + Qadbe + Qbdce - Qadce)
        + aecd * (Qabcd + Qaebc + Qaebd + Qbecd - Qaecd)
        + bcde * (Qadbc + Qaebc + Qabde + Qacde - Qbcde)
        + bdce * (Qacbd + Qabce + Qaebd + Qadce - Qbdce)
        + becd * (Qabcd + Qacbe + Qadbe + Qaecd - Qbecd))


def seq4(as_, bs, cs, ds, ar, br, cr, dr, ab, ac, ad, bc, bd, cd):
    """Sphere-quadruple separation certificate (SphinxOverlap.h:607)."""
    g1 = as_ * ((bc * (ad + dr - ar) - (ab - ac) * (br - cr))
                * (bd + cd - bc)
                + (bd * (ac + cr - ar) - (ab - ad) * (br - dr))
                * (bc + cd - bd)
                + (cd * (ab + br - ar) - (ac - ad) * (cr - dr))
                * (bc + bd - cd) - 2 * bc * bd * cd) >= -EPS
    g2 = bs * ((ac * (bd + dr - br) - (ab - bc) * (ar - cr))
               * (ad + cd - ac)
               + (ad * (bc + cr - br) - (ab - bd) * (ar - dr))
               * (ac + cd - ad)
               + (cd * (ab + ar - br) - (bc - bd) * (cr - dr))
               * (ac + ad - cd) - 2 * ac * ad * cd) >= -EPS
    g3 = cs * ((ab * (cd + dr - cr) - (ac - bc) * (ar - br))
               * (ad + bd - ab)
               + (ad * (bc + br - cr) - (ac - cd) * (ar - dr))
               * (ab + bd - ad)
               + (bd * (ac + ar - cr) - (bc - cd) * (br - dr))
               * (ab + ad - bd) - 2 * ab * ad * bd) >= -EPS
    g4 = ds * ((ab * (cd + cr - dr) - (ad - bd) * (ar - br))
               * (ac + bc - ab)
               + (ac * (bd + br - dr) - (ad - cd) * (ar - cr))
               * (ab + bc - ac)
               + (bc * (ad + ar - dr) - (bd - cd) * (br - cr))
               * (ab + ac - bc) - 2 * ab * ac * bc) >= -EPS
    expr = _vok4(ab, ac, ad, ar, bc, bd, br, cd, cr, dr) <= EPS
    return g1 & g2 & g3 & g4 & expr


def subset_tables(K):
    """Static (numpy) subset index tables over K spheres: pairs (n2, 2),
    triples (n3, 3), quads (n4, 4)."""
    def combos(m):
        out = np.array(list(itertools.combinations(range(K), m)),
                       np.int32)
        return out.reshape(-1, m)
    return combos(2), combos(3), combos(4)


def arrangement_separated(pos, R2, sgn, valid, tables):
    """True where the sphere arrangement is certified disjoint.

    pos (..., K, 3) sphere centers; R2 (..., K) squared radii;
    sgn (..., K) +-1; valid (..., K) padding mask; tables from
    subset_tables(K).  Batched over leading dims.
    """
    import jax.numpy as jnp
    p2, p3, p4 = tables
    d = pos[..., :, None, :] - pos[..., None, :, :]
    D = jnp.sum(d * d, axis=-1)                       # (..., K, K)

    def take(a, idx):
        return a[..., idx]

    def dd(i, j):
        return D[..., i, j]

    sep = jnp.zeros(pos.shape[:-2], bool)
    # pairs
    a, b = p2[:, 0], p2[:, 1]
    ok = take(valid, a) & take(valid, b)
    s = seq2(take(sgn, a), take(sgn, b), take(R2, a), take(R2, b),
             dd(a, b))
    sep = sep | jnp.any(s & ok, axis=-1)
    # triples
    if len(p3):
        a, b, c = p3[:, 0], p3[:, 1], p3[:, 2]
        ok = take(valid, a) & take(valid, b) & take(valid, c)
        s = seq3(take(sgn, a), take(sgn, b), take(sgn, c),
                 take(R2, a), take(R2, b), take(R2, c),
                 dd(a, b), dd(a, c), dd(b, c))
        sep = sep | jnp.any(s & ok, axis=-1)
    # quadruples
    if len(p4):
        a, b, c, e = p4[:, 0], p4[:, 1], p4[:, 2], p4[:, 3]
        ok = (take(valid, a) & take(valid, b) & take(valid, c)
              & take(valid, e))
        s = seq4(take(sgn, a), take(sgn, b), take(sgn, c), take(sgn, e),
                 take(R2, a), take(R2, b), take(R2, c), take(R2, e),
                 dd(a, b), dd(a, c), dd(a, e), dd(b, c), dd(b, e),
                 dd(c, e))
        sep = sep | jnp.any(s & ok, axis=-1)
    return sep
