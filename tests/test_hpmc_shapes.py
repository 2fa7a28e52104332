"""HPMC anisotropic shapes: SAT convex-polyhedron overlap vs an
LP-feasibility oracle, hard-cube MC invariants, sphere unions."""

import numpy as np
import pytest

CUBE = [(-0.5, -0.5, -0.5), (0.5, -0.5, -0.5), (0.5, 0.5, -0.5),
        (-0.5, 0.5, -0.5), (-0.5, -0.5, 0.5), (0.5, -0.5, 0.5),
        (0.5, 0.5, 0.5), (-0.5, 0.5, 0.5)]
TETRA = [(0.5, 0.5, 0.5), (0.5, -0.5, -0.5), (-0.5, 0.5, -0.5),
         (-0.5, -0.5, 0.5)]


def rot_np(q, v):
    w = q[0]
    u = np.asarray(q[1:])
    t = 2 * np.cross(u, v)
    return v + w * t + np.cross(u, t)


def lp_overlap(verts_a, q_a, x_a, verts_b, q_b, x_b):
    """Exact intersection test of two convex polytopes via LP feasibility."""
    from scipy.optimize import linprog
    from scipy.spatial import ConvexHull
    va = np.array([rot_np(q_a, v) for v in verts_a]) + x_a
    vb = np.array([rot_np(q_b, v) for v in verts_b]) + x_b
    ha, hb = ConvexHull(va), ConvexHull(vb)
    A = np.vstack([ha.equations[:, :3], hb.equations[:, :3]])
    b = -np.concatenate([ha.equations[:, 3], hb.equations[:, 3]])
    res = linprog(np.zeros(3), A_ub=A, b_ub=b - 1e-9,
                  bounds=[(None, None)] * 3, method='highs')
    return res.status == 0


def rand_quat(rng):
    q = rng.normal(size=4)
    return q / np.linalg.norm(q)


@pytest.mark.parametrize("verts", [CUBE, TETRA])
def test_sat_matches_lp_oracle(verts):
    import jax.numpy as jnp
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    from hoomd_tpu.ops import quat as Q
    # build a minimal system so the integrator can pack its tables
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=4.0), n=3)
    mc = hpmc.integrate.convex_polyhedron(seed=1, d=0.1, a=0.1)
    mc.shape_param.set('A', vertices=verts)
    system = hoomd.context.current.system
    fn = mc._make_overlap_fn(system)

    rng = np.random.RandomState(0)
    n_checked = 0
    mismatches = []
    for trial in range(120):
        qa, qb = rand_quat(rng), rand_quat(rng)
        dx = rng.uniform(-1.6, 1.6, 3)
        ref = lp_overlap(verts, qa, dx, verts, qb, np.zeros(3))
        dr = jnp.asarray(dx, jnp.float32).reshape(1, 1, 3)
        got = bool(np.asarray(fn(
            dr, jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32),
            None, None, None,
            q_i=jnp.asarray(qa, jnp.float32).reshape(1, 4),
            q_j=jnp.asarray(qb, jnp.float32).reshape(1, 1, 4)))[0, 0])
        # skip marginal contacts (f32 vs f64 disagreements are expected
        # within a thin shell)
        near = lp_overlap(verts, qa, dx * (1 - 5e-3), verts, qb,
                          np.zeros(3)) != \
            lp_overlap(verts, qa, dx * (1 + 5e-3), verts, qb, np.zeros(3))
        if near:
            continue
        n_checked += 1
        if got != ref:
            mismatches.append((trial, dx, got, ref))
    assert n_checked > 60
    assert not mismatches, mismatches[:3]


def test_hard_cubes_mc():
    """Hard cubes: MC runs, rotations happen, and no overlapping pair
    survives (checked with the LP oracle)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    n = 4
    a = 1.7          # packing fraction 1/1.7^3 ~ 0.20
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=n)
    mc = hpmc.integrate.convex_polyhedron(seed=11, d=0.15, a=0.25,
                                          nselect=2)
    mc.shape_param.set('A', vertices=CUBE)
    system = hoomd.context.current.system
    q0 = system.take_snapshot().particles.orientation.copy()
    hoomd.run(40, quiet=True)
    snap = system.take_snapshot()
    assert mc.get_translate_acceptance() > 0.1
    assert mc.get_rotate_acceptance() > 0.1
    # orientations moved
    assert np.abs(snap.particles.orientation - q0).max() > 1e-3
    # no overlaps: LP-check every near pair
    p = snap.particles.position
    q = snap.particles.orientation
    L = snap.box.Lx
    checked = 0
    for i in range(len(p)):
        for j in range(i + 1, len(p)):
            d = p[j] - p[i]
            d -= L * np.round(d / L)
            if np.linalg.norm(d) < np.sqrt(3.0):   # circumsphere reach
                checked += 1
                assert not lp_overlap(CUBE, q[i], np.zeros(3),
                                      CUBE, q[j], d), (i, j)
    assert checked > 10


def test_sphere_union_dumbbell():
    """Dumbbells (two fused spheres): MC preserves no-overlap between
    constituent spheres of different particles."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=2.2), n=3)
    mc = hpmc.integrate.sphere_union(seed=5, d=0.1, a=0.3, nselect=2)
    mc.shape_param.set('A', diameters=[1.0, 1.0],
                       centers=[(-0.25, 0, 0), (0.25, 0, 0)])
    system = hoomd.context.current.system
    hoomd.run(30, quiet=True)
    snap = system.take_snapshot()
    p, q = snap.particles.position, snap.particles.orientation
    L = snap.box.Lx
    centers = np.array([(-0.25, 0, 0), (0.25, 0, 0)])
    for i in range(len(p)):
        for j in range(i + 1, len(p)):
            d = p[j] - p[i]
            d -= L * np.round(d / L)
            if np.linalg.norm(d) > 2.0:
                continue
            ci = np.array([rot_np(q[i], c) for c in centers])
            cj = np.array([rot_np(q[j], c) for c in centers]) + d
            dist = np.linalg.norm(ci[:, None] - cj[None, :], axis=-1)
            assert dist.min() >= 1.0 - 1e-4, (i, j, dist.min())
    assert mc.get_translate_acceptance() > 0.05


def test_overlap_fn_batched_shapes():
    """Regression: overlap functions must broadcast correctly for M>1
    selected particles and C>1 candidates (a missing quaternion axis once
    produced silently wrong (M,M,...) shapes)."""
    import jax.numpy as jnp
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=4.0), n=3)
    mc = hpmc.integrate.convex_polyhedron(seed=1, d=0.1, a=0.1)
    mc.shape_param.set('A', vertices=CUBE)
    fn = mc._make_overlap_fn(hoomd.context.current.system)
    M, C = 3, 5
    rng = np.random.RandomState(1)
    # candidate 0 of each row overlaps (dr=0.3), the rest are far away
    dr = np.full((M, C, 3), 5.0)
    dr[:, 0] = [0.3, 0, 0]
    qs = np.array([rand_quat(rng) for _ in range(M)])
    qjs = np.array([[rand_quat(rng) for _ in range(C)]
                    for _ in range(M)])
    out = np.asarray(fn(
        jnp.asarray(dr, jnp.float32),
        jnp.zeros((M, 1), jnp.int32), jnp.zeros((M, C), jnp.int32),
        None, None, None,
        q_i=jnp.asarray(qs, jnp.float32),
        q_j=jnp.asarray(qjs, jnp.float32)))
    assert out.shape == (M, C)
    assert out[:, 0].all()        # overlapping column
    assert not out[:, 1:].any()   # far columns

    # sphere_union batched too
    hoomd.context.initialize('--notice-level=0')
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=4.0), n=3)
    mu = hpmc.integrate.sphere_union(seed=1, d=0.1, a=0.1)
    mu.shape_param.set('A', diameters=[1.0, 1.0],
                       centers=[(-0.25, 0, 0), (0.25, 0, 0)])
    fn2 = mu._make_overlap_fn(hoomd.context.current.system)
    out2 = np.asarray(fn2(
        jnp.asarray(dr, jnp.float32),
        jnp.zeros((M, 1), jnp.int32), jnp.zeros((M, C), jnp.int32),
        None, None, None,
        q_i=jnp.asarray(qs, jnp.float32),
        q_j=jnp.asarray(qjs, jnp.float32)))
    assert out2.shape == (M, C)
    assert out2[:, 0].all()
    assert not out2[:, 1:].any()


def _poly_distance_oracle(PA, PB, rng):
    from scipy.optimize import minimize
    nA, nB = len(PA), len(PB)

    def f(x):
        p = x[:nA] @ PA - x[nA:] @ PB
        return p @ p
    cons = [{'type': 'eq', 'fun': lambda x: x[:nA].sum() - 1},
            {'type': 'eq', 'fun': lambda x: x[nA:].sum() - 1}]
    best = None
    for _ in range(3):
        x0 = np.abs(rng.rand(nA + nB)) + 1e-3
        x0[:nA] /= x0[:nA].sum()
        x0[nA:] /= x0[nA:].sum()
        r = minimize(f, x0, bounds=[(0, 1)] * (nA + nB),
                     constraints=cons, method='SLSQP',
                     options={'maxiter': 300, 'ftol': 1e-14})
        v = np.sqrt(max(r.fun, 0))
        best = v if best is None else min(best, v)
    return best


def test_spheropolyhedron_overlap_vs_oracle():
    """GJK overlap (core distance <= Rsum) vs a scipy QP distance oracle
    for randomly oriented sphero-tetrahedra."""
    import jax.numpy as jnp
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=4.0), n=3)
    R = 0.25
    mc = hpmc.integrate.convex_spheropolyhedron(seed=1, d=0.1, a=0.1)
    mc.shape_param.set('A', vertices=TETRA, sweep_radius=R)
    system = hoomd.context.current.system
    fn = mc._make_overlap_fn(system)
    rng = np.random.RandomState(4)
    n_checked, mismatches = 0, []
    for trial in range(80):
        qa, qb = rand_quat(rng), rand_quat(rng)
        dx = rng.uniform(-2.2, 2.2, 3)
        va = np.array([rot_np(qa, np.array(v)) for v in TETRA]) + dx
        vb = np.array([rot_np(qb, np.array(v)) for v in TETRA])
        dist = _poly_distance_oracle(va, vb, rng)
        if abs(dist - 2 * R) < 2e-2:      # skip marginal contacts
            continue
        ref = dist <= 2 * R
        got = bool(np.asarray(fn(
            jnp.asarray(dx, jnp.float32).reshape(1, 1, 3),
            jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32),
            None, None, None,
            q_i=jnp.asarray(qa, jnp.float32).reshape(1, 4),
            q_j=jnp.asarray(qb, jnp.float32).reshape(1, 1, 4)))[0, 0])
        n_checked += 1
        if got != ref:
            mismatches.append((trial, dx, dist, got, ref))
    assert n_checked > 40
    assert not mismatches, mismatches[:3]


def _ellipsoid_overlap_oracle(abc1, q1, x1, abc2, q2, x2):
    """Perram-Wertheim contact function: overlap iff
    max_l l(1-l) r^T (l B + (1-l) A)^{-1} r < 1, A = R diag(abc^2) R^T."""
    from scipy.optimize import minimize_scalar

    def mat(abc, q):
        w, x, y, z = q
        Rm = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
             2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
             2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x),
             1 - 2 * (x * x + y * y)]])
        return Rm @ np.diag(np.asarray(abc) ** 2) @ Rm.T
    A, B = mat(abc1, q1), mat(abc2, q2)
    r = np.asarray(x2) - np.asarray(x1)

    def negF(l):
        M = l * B + (1 - l) * A
        return -l * (1 - l) * r @ np.linalg.solve(M, r)
    res = minimize_scalar(negF, bounds=(1e-9, 1 - 1e-9), method='bounded',
                          options={'xatol': 1e-12})
    return -res.fun < 1.0


def test_ellipsoid_overlap_vs_perram_wertheim():
    import jax.numpy as jnp
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=5.0), n=3)
    abc = (1.0, 0.6, 0.4)
    mc = hpmc.integrate.ellipsoid(seed=1, d=0.1, a=0.1)
    mc.shape_param.set('A', a=abc[0], b=abc[1], c=abc[2])
    system = hoomd.context.current.system
    fn = mc._make_overlap_fn(system)
    rng = np.random.RandomState(7)
    n_checked, mismatches = 0, []
    for trial in range(80):
        qa, qb = rand_quat(rng), rand_quat(rng)
        dx = rng.uniform(-2.0, 2.0, 3)
        ref = _ellipsoid_overlap_oracle(abc, qa, dx, abc, qb,
                                        np.zeros(3))
        near = _ellipsoid_overlap_oracle(
            abc, qa, dx * 0.99, abc, qb, np.zeros(3)) != \
            _ellipsoid_overlap_oracle(abc, qa, dx * 1.01, abc, qb,
                                      np.zeros(3))
        if near:
            continue
        got = bool(np.asarray(fn(
            jnp.asarray(dx, jnp.float32).reshape(1, 1, 3),
            jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32),
            None, None, None,
            q_i=jnp.asarray(qa, jnp.float32).reshape(1, 4),
            q_j=jnp.asarray(qb, jnp.float32).reshape(1, 1, 4)))[0, 0])
        n_checked += 1
        if got != ref:
            mismatches.append((trial, dx, got, ref))
    assert n_checked > 40
    assert not mismatches, mismatches[:3]


def test_spherocylinder_mc_no_overlaps():
    """MC with spherocylinders (2-vertex spheropolyhedra) runs and leaves
    no overlapping pair (segment-segment distance oracle)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=2.2), n=4)
    R, H = 0.3, 0.5       # radius, half-length
    mc = hpmc.integrate.convex_spheropolyhedron(seed=5, d=0.12, a=0.3,
                                                nselect=2)
    mc.shape_param.set('A', vertices=[(0, 0, -H), (0, 0, H)],
                       sweep_radius=R)
    hoomd.run(60, quiet=True)
    system = hoomd.context.current.system
    snap = system.take_snapshot()
    pos = snap.particles.position
    q = snap.particles.orientation
    L = snap.box.Lx
    N = len(pos)

    def seg_dist(p1, d1, p2, d2):
        # closest distance between segments [p1±d1], [p2±d2]
        from scipy.optimize import minimize
        f = lambda t: np.linalg.norm((p1 + t[0] * d1) - (p2 + t[1] * d2))
        best = 1e9
        for t0 in ([0, 0], [1, -1], [-1, 1]):
            r = minimize(f, t0, bounds=[(-1, 1), (-1, 1)])
            best = min(best, r.fun)
        return best
    axes = np.array([rot_np(qq, np.array([0, 0, H])) for qq in q])
    bad = 0
    for i in range(N):
        for j in range(i + 1, N):
            dr = pos[i] - pos[j]
            dr -= L * np.round(dr / L)
            if np.linalg.norm(dr) > 2 * (H + R) + 0.1:
                continue
            d = seg_dist(dr, axes[i], np.zeros(3), axes[j])
            if d < 2 * R - 1e-3:
                bad += 1
    assert bad == 0
    # rotations actually happened
    assert np.abs(q[:, 1:]).max() > 1e-3


def test_polyhedron_union_overlap():
    """Union of two cubes per particle: overlap iff any member pair
    overlaps (LP oracle per member pair)."""
    import jax.numpy as jnp
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=6.0), n=3)
    mc = hpmc.integrate.convex_polyhedron_union(seed=1, d=0.1, a=0.1)
    centers = [(-0.8, 0, 0), (0.8, 0, 0)]
    mc.shape_param.set('A', vertices=[CUBE, CUBE], centers=centers,
                       orientations=[(1, 0, 0, 0), (1, 0, 0, 0)])
    system = hoomd.context.current.system
    fn = mc._make_overlap_fn(system)
    rng = np.random.RandomState(11)
    n_checked, mismatches = 0, []
    for trial in range(60):
        qa, qb = rand_quat(rng), rand_quat(rng)
        dx = rng.uniform(-3.0, 3.0, 3)
        ref = False
        for ca in centers:
            for cb in centers:
                xa = rot_np(qa, np.array(ca)) + dx
                xb = rot_np(qb, np.array(cb))
                if lp_overlap(CUBE, qa, xa, CUBE, qb, xb):
                    ref = True
        near = False
        for eps in (0.99, 1.01):
            r2 = False
            for ca in centers:
                for cb in centers:
                    xa = rot_np(qa, np.array(ca)) + dx * eps
                    xb = rot_np(qb, np.array(cb))
                    if lp_overlap(CUBE, qa, xa, CUBE, qb, xb):
                        r2 = True
            near = near or (r2 != ref)
        if near:
            continue
        got = bool(np.asarray(fn(
            jnp.asarray(dx, jnp.float32).reshape(1, 1, 3),
            jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32),
            None, None, None,
            q_i=jnp.asarray(qa, jnp.float32).reshape(1, 4),
            q_j=jnp.asarray(qb, jnp.float32).reshape(1, 1, 4)))[0, 0])
        n_checked += 1
        if got != ref:
            mismatches.append((trial, dx, got, ref))
    assert n_checked > 30
    assert not mismatches, mismatches[:3]


TETRA_FACES = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
CUBE_FACES = [(0, 1, 2), (0, 2, 3), (4, 6, 5), (4, 7, 6),
              (0, 4, 5), (0, 5, 1), (3, 2, 6), (3, 6, 7),
              (1, 5, 6), (1, 6, 2), (0, 3, 7), (0, 7, 4)]


def test_mesh_polyhedron_overlap_and_containment():
    import jax.numpy as jnp
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=5.0), n=3)
    mc = hpmc.integrate.polyhedron(seed=1, d=0.1, a=0.1)
    mc.shape_param.set('A', vertices=TETRA, faces=TETRA_FACES)
    system = hoomd.context.current.system
    fn = mc._make_overlap_fn(system)
    rng = np.random.RandomState(3)
    n_checked, mismatches = 0, []
    for trial in range(60):
        qa, qb = rand_quat(rng), rand_quat(rng)
        dx = rng.uniform(-1.4, 1.4, 3)
        ref = lp_overlap(TETRA, qa, dx, TETRA, qb, np.zeros(3))
        near = lp_overlap(TETRA, qa, dx * 0.99, TETRA, qb,
                          np.zeros(3)) != \
            lp_overlap(TETRA, qa, dx * 1.01, TETRA, qb, np.zeros(3))
        if near:
            continue
        got = bool(np.asarray(fn(
            jnp.asarray(dx, jnp.float32).reshape(1, 1, 3),
            jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32),
            None, None, None,
            q_i=jnp.asarray(qa, jnp.float32).reshape(1, 4),
            q_j=jnp.asarray(qb, jnp.float32).reshape(1, 1, 4)))[0, 0])
        n_checked += 1
        if got != ref:
            mismatches.append((trial, dx, got, ref))
    assert n_checked > 30
    assert not mismatches, mismatches[:3]


def test_mesh_polyhedron_containment():
    """A small tetra fully inside a big cube has no surface crossing:
    only the ray-parity containment test can catch it."""
    import jax.numpy as jnp
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    snap = hoomd.data.make_snapshot(
        8, hoomd.data.boxdim(L=30), particle_types=['big', 'small'])
    snap.particles.position[:] = np.linspace(-10, 10, 8)[:, None] \
        * np.array([1.0, 0, 0])
    snap.particles.typeid[:4] = 0
    snap.particles.typeid[4:] = 1
    hoomd.init.read_snapshot(snap)
    mc = hpmc.integrate.polyhedron(seed=1, d=0.05, a=0.05)
    big = [(3 * x, 3 * y, 3 * z) for (x, y, z) in CUBE]
    mc.shape_param.set('big', vertices=big, faces=CUBE_FACES)
    small = [(0.2 * np.array(v)).tolist() for v in TETRA]
    mc.shape_param.set('small', vertices=small, faces=TETRA_FACES)
    system = hoomd.context.current.system
    fn = mc._make_overlap_fn(system)

    def check(dx):
        return bool(np.asarray(fn(
            jnp.asarray(dx, jnp.float32).reshape(1, 1, 3),
            jnp.zeros((1, 1), jnp.int32),      # big is i
            jnp.ones((1, 1), jnp.int32),       # small is j
            None, None, None,
            q_i=jnp.asarray([1., 0, 0, 0], jnp.float32).reshape(1, 4),
            q_j=jnp.asarray([1., 0, 0, 0],
                            jnp.float32).reshape(1, 1, 4)))[0, 0])
    assert check(np.zeros(3))           # small inside big -> overlap
    assert check(np.array([1.0, 0.4, -0.3]))   # still inside
    assert not check(np.array([5.0, 0, 0]))    # outside


def test_faceted_sphere_hemisphere():
    """Hemispheres (unit sphere cut by x<=0 in body frame): analytic
    overlap cases.  dr = x_i - x_j: particle i sits displaced by dx."""
    import jax.numpy as jnp
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=4.0), n=3)
    mc = hpmc.integrate.faceted_sphere(seed=1, d=0.1, a=0.1)
    mc.shape_param.set('A', normals=[(1.0, 0, 0)], offsets=[0.0],
                       diameter=1.0)
    system = hoomd.context.current.system
    fn = mc._make_overlap_fn(system)

    def check(dx, qa=(1, 0, 0, 0), qb=(1, 0, 0, 0)):
        return bool(np.asarray(fn(
            jnp.asarray(dx, jnp.float32).reshape(1, 1, 3),
            jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32),
            None, None, None,
            q_i=jnp.asarray(qa, jnp.float32).reshape(1, 4),
            q_j=jnp.asarray(qb, jnp.float32).reshape(1, 1, 4)))[0, 0])
    q180 = (0, 0, 0, 1)      # 180 deg about z: flat side flips to x>=0
    # both flat sides at low x: i at +0.3 -> lens reaches x<=0: overlap
    assert check([0.3, 0, 0])
    # i at +0.6: i's ball needs x>0.1, j's halfspace x<=0: no overlap
    assert not check([0.6, 0, 0])
    # j flipped (occupies [0, .5]); i identity at 0.2 ([-0.3, .2]): lens
    assert check([0.2, 0, 0], qb=q180)
    # i flipped at 0.8 ([0.8, 1.3]) vs j identity ([-0.5, 0]): apart
    assert not check([0.8, 0, 0], qa=q180)
    # flat faces touching back-to-back: i flipped at -0.95, j identity:
    # i occupies [-0.95, -0.45], j [-0.5, 0]: round-vs-round overlap
    assert check([-0.95, 0, 0], qa=q180)
    assert not check([-1.05, 0, 0], qa=q180)


def test_simple_polygon_nonconvex():
    """Non-convex L-shapes: edge-crossing + 2D parity containment vs a
    matplotlib.path + segment-orientation oracle."""
    import jax.numpy as jnp
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    from matplotlib.path import Path
    LS = [(x - 0.45, y - 0.45) for x, y in
          [(0, 0), (1, 0), (1, 0.4), (0.4, 0.4), (0.4, 1), (0, 1)]]
    hoomd.context.initialize("--notice-level=0")
    snap = hoomd.data.make_snapshot(
        9, hoomd.data.boxdim(L=20, dimensions=2))
    snap.particles.position[:] = np.c_[
        np.linspace(-8, 8, 9), np.zeros(9), np.zeros(9)]
    hoomd.init.read_snapshot(snap)
    mc = hpmc.integrate.simple_polygon(seed=1, d=0.1, a=0.1)
    mc.shape_param.set('A', vertices=LS)
    fn = mc._make_overlap_fn(hoomd.context.current.system)

    def rot2(th, v):
        c, s = np.cos(th), np.sin(th)
        return np.array([c * v[0] - s * v[1], s * v[0] + c * v[1]])

    def oracle(dx, tha, thb):
        va = np.array([rot2(tha, np.array(v)) for v in LS]) + dx[:2]
        vb = np.array([rot2(thb, np.array(v)) for v in LS])

        def orient(p, q, r):
            return (q[0] - p[0]) * (r[1] - p[1]) \
                - (q[1] - p[1]) * (r[0] - p[0])
        for i in range(len(va)):
            a0, a1 = va[i], va[(i + 1) % len(va)]
            for j in range(len(vb)):
                b0, b1 = vb[j], vb[(j + 1) % len(vb)]
                if orient(b0, b1, a0) * orient(b0, b1, a1) < 0 \
                        and orient(a0, a1, b0) * orient(a0, a1, b1) < 0:
                    return True
        return Path(va).contains_point(vb[0]) \
            or Path(vb).contains_point(va[0])
    rng = np.random.RandomState(5)
    nck, mis = 0, []
    for trial in range(60):
        tha, thb = rng.uniform(0, 2 * np.pi, 2)
        dx = rng.uniform(-1.5, 1.5, 3)
        dx[2] = 0
        ref = oracle(dx, tha, thb)
        if oracle(dx * 0.99, tha, thb) != oracle(dx * 1.01, tha, thb):
            continue
        qa = np.array([np.cos(tha / 2), 0, 0, np.sin(tha / 2)])
        qb = np.array([np.cos(thb / 2), 0, 0, np.sin(thb / 2)])
        got = bool(np.asarray(fn(
            jnp.asarray(dx, jnp.float32).reshape(1, 1, 3),
            jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.int32),
            None, None, None,
            q_i=jnp.asarray(qa, jnp.float32).reshape(1, 4),
            q_j=jnp.asarray(qb, jnp.float32).reshape(1, 1, 4)))[0, 0])
        nck += 1
        if got != ref:
            mis.append((trial, dx, got, ref))
    assert nck > 30
    assert not mis, mis[:3]


def test_sphinx_overlap_vs_sampling_oracle():
    """Sphinx (dimpled-sphere) separation algebra vs a dense point-
    membership oracle on random dimpled-sphere pairs."""
    import jax.numpy as jnp
    from hoomd_tpu.hpmc.sphinx_overlap import (arrangement_separated,
                                               subset_tables)

    rng = np.random.RandomState(2)

    def rotmat(q):
        w, x, y, z = q
        return np.array(
            [[1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
              2 * (x * z + w * y)],
             [2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
              2 * (y * z - w * x)],
             [2 * (x * z - w * y), 2 * (y * z + w * x),
              1 - 2 * (x * x + y * y)]])

    def member(z, cen, rad):
        d2 = ((z[:, None, :] - cen[None]) ** 2).sum(-1)
        ok = np.where(rad[None] > 0, d2 <= rad[None] ** 2,
                      d2 >= rad[None] ** 2)
        return ok.all(1)

    def oracle(cenp, radp, cenq, radq, ngrid=40):
        lo = (cenp[radp > 0] - radp[radp > 0, None]).min(0)
        hi = (cenp[radp > 0] + radp[radp > 0, None]).max(0)
        g = [np.linspace(lo[k], hi[k], ngrid) for k in range(3)]
        Z = np.stack(np.meshgrid(*g, indexing='ij'), -1).reshape(-1, 3)
        return (member(Z, cenp, radp) & member(Z, cenq, radq)).any()

    def mkshape():
        nneg = rng.randint(0, 4)
        cen = [np.zeros(3)]
        rad = [1.0]
        for _ in range(nneg):
            u = rng.normal(size=3)
            u /= np.linalg.norm(u)
            cen.append(u * 1.1)
            rad.append(-rng.uniform(0.3, 0.6))
        return np.array(cen), np.array(rad)

    checked = 0
    for t in range(60):
        cp, rp = mkshape()
        cq, rq = mkshape()
        qp = rotmat(rand_quat(rng))
        qq = rotmat(rand_quat(rng))
        rab = rng.uniform(-2.2, 2.2, 3)
        cenp = cp @ qp.T
        cenq = cq @ qq.T + rab
        o = oracle(cenp, rp, cenq, rq)
        # skip marginal geometries where the grid oracle is ambiguous
        if oracle(cenp, rp * 1.03, cenq, rq * 1.03) != \
                oracle(cenp, rp * 0.97, cenq, rq * 0.97):
            continue
        S = max(len(rp), len(rq))
        pos = np.zeros((2 * S, 3))
        r = np.zeros(2 * S)
        pos[:len(rp)] = cenp
        r[:len(rp)] = rp
        pos[S:S + len(rq)] = cenq
        r[S:S + len(rq)] = rq
        sep = bool(arrangement_separated(
            jnp.asarray(pos)[None], jnp.asarray(r * r)[None],
            jnp.asarray(np.where(r < 0, -1.0, 1.0))[None],
            jnp.asarray(r != 0)[None], subset_tables(2 * S))[0])
        assert (not sep) == o, (t, rp, rq, rab)
        checked += 1
    assert checked >= 40


def test_sphinx_mc_dimpled_spheres():
    """Dimpled-sphere MC: moves accepted, and no final-state overlaps per
    the sphinx predicate (reference hpmc.integrate.sphinx)."""
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=1.6), n=3)
    mc = hpmc.integrate.sphinx(seed=7, d=0.1, a=0.3, nselect=2)
    mc.shape_param.set('A', diameters=[1.0, -1.2],
                       centers=[(0, 0, 0), (0.75, 0, 0)])
    hoomd.run(20, quiet=True)
    assert mc.count_overlaps() == 0
    assert mc.get_translate_acceptance() > 0.05
