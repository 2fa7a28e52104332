"""Pallas cell-pair LJ kernel vs the Verlet-list reference path
(interpret mode on CPU; compiled on TPU)."""

import numpy as np
import pytest


def test_cell_pair_kernel_matches_bruteforce():
    import jax
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    from hoomd_tpu.ops import cells
    from hoomd_tpu.ops.pallas_pair import (build_cell_layout,
                                           build_cell_shifts, cell_pair_lj)

    rng = np.random.RandomState(0)
    N, L, rc = 96, 7.5, 2.5
    # non-overlapping-ish random config
    pos_np = rng.uniform(-L / 2, L / 2, (N, 3)).astype(np.float32)
    box = Box.create(L)
    cell_dim = cells.choose_cell_dim(np.array([L] * 3), rc)
    ncells = int(np.prod(cell_dim))
    C = 64
    pos = jnp.asarray(pos_np)
    cell_pos, cell_pid, ovf = build_cell_layout(pos, box, cell_dim, C)
    assert not bool(ovf)
    adj, shifts = build_cell_shifts(cell_dim, np.array([L] * 3))
    lj1, lj2 = 4.0, 4.0
    rc6i = 1.0 / rc ** 6
    e_shift = rc6i * (lj1 * rc6i - lj2)
    params = jnp.asarray([lj1, lj2, rc * rc, e_shift], jnp.float32)

    f_cell, pe_cell, vir_cell = cell_pair_lj(
        cell_pos, jnp.asarray(adj), jnp.asarray(shifts, jnp.float32),
        params, ncells=ncells, C=C, interpret=True)

    # map back to particle order
    pid = np.asarray(cell_pid).reshape(-1)
    fc = np.asarray(f_cell).reshape(-1, 3)
    pc = np.asarray(pe_cell).reshape(-1)
    force = np.zeros((N, 3))
    pe = np.zeros(N)
    sel = pid < N
    force[pid[sel]] = fc[sel]
    pe[pid[sel]] = pc[sel]

    # brute-force oracle (numpy, float64)
    p64 = pos_np.astype(np.float64)
    dr = p64[:, None] - p64[None, :]
    dr -= L * np.round(dr / L)
    r2 = (dr ** 2).sum(-1)
    np.fill_diagonal(r2, 1e9)
    within = r2 < rc * rc
    r6i = 1.0 / r2 ** 3
    fdivr = np.where(within, (12 * lj1 * r6i - 6 * lj2) * r6i / r2, 0.0)
    f_ref = (fdivr[:, :, None] * dr).sum(axis=1)
    e_ref = 0.5 * np.where(within, r6i * (lj1 * r6i - lj2) - e_shift,
                           0.0).sum(axis=1)

    scale = np.abs(f_ref).max()
    np.testing.assert_allclose(force, f_ref, atol=2e-4 * scale)
    np.testing.assert_allclose(pe, e_ref, rtol=2e-4, atol=1e-5)
    # virial trace vs oracle
    w_ref = 0.5 * (fdivr * r2 * within).sum(axis=1)
    vir = np.zeros((N, 6))
    vir[pid[sel]] = np.asarray(vir_cell).reshape(-1, 6)[sel]
    w_got = vir[:, 0] + vir[:, 3] + vir[:, 5]
    np.testing.assert_allclose(w_got, w_ref, rtol=5e-4,
                               atol=1e-4 * max(1.0, np.abs(w_ref).max()))


def test_cell_pair_kernel_small_grid_duplicates():
    """Grids with <3 cells per axis: duplicate stencil slots must not
    double-count."""
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    from hoomd_tpu.ops import cells
    from hoomd_tpu.ops.pallas_pair import (build_cell_layout,
                                           build_cell_shifts, cell_pair_lj)
    N, L, rc = 16, 6.0, 2.5
    rng = np.random.RandomState(3)
    pos_np = rng.uniform(-L / 2, L / 2, (N, 3)).astype(np.float32)
    box = Box.create(L)
    cell_dim = cells.choose_cell_dim(np.array([L] * 3), rc)  # 2x2x2
    assert max(cell_dim) <= 2
    ncells = int(np.prod(cell_dim))
    C = 16
    pos = jnp.asarray(pos_np)
    cell_pos, cell_pid, ovf = build_cell_layout(pos, box, cell_dim, C)
    adj, shifts = build_cell_shifts(cell_dim, np.array([L] * 3))
    params = jnp.asarray([4.0, 4.0, rc * rc, 0.0], jnp.float32)
    f_cell, pe_cell, vir_cell = cell_pair_lj(
        cell_pos, jnp.asarray(adj), jnp.asarray(shifts, jnp.float32),
        params, ncells=ncells, C=C, interpret=True)
    pid = np.asarray(cell_pid).reshape(-1)
    pc = np.asarray(pe_cell).reshape(-1)
    pe = np.zeros(N)
    pe[pid[pid < N]] = pc[pid < N]

    p64 = pos_np.astype(np.float64)
    dr = p64[:, None] - p64[None, :]
    dr -= L * np.round(dr / L)
    r2 = (dr ** 2).sum(-1)
    np.fill_diagonal(r2, 1e9)
    within = r2 < rc * rc
    r6i = 1.0 / r2 ** 3
    e_ref = 0.5 * np.where(within, r6i * (4 * r6i - 4), 0.0).sum(axis=1)
    np.testing.assert_allclose(pe, e_ref, rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["planar", "row", "pallas3d"])
def test_stencil_kernels_match_bruteforce(impl):
    """The grid-stencil kernel family (no scalar prefetch) vs float64
    brute force, including periodic wraps in all axes."""
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    from hoomd_tpu.ops import cells
    from hoomd_tpu.ops.pallas_pair import (build_cell_layout,
                                           build_cell_shifts,
                                           cell_pair_lj_pallas3d,
                                           cell_pair_lj_planar,
                                           cell_pair_lj_row)
    fn = {"planar": cell_pair_lj_planar, "row": cell_pair_lj_row,
          "pallas3d": cell_pair_lj_pallas3d}[impl]
    rng = np.random.RandomState(0)
    n, a = 6, 1.4
    N, L, rc = n ** 3, n * 1.4, 2.0
    grid = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing='ij'),
                    -1).reshape(-1, 3)
    pos_np = ((grid + 0.5) * a - L / 2
              + rng.uniform(-0.2, 0.2, (N, 3))).astype(np.float32)
    box = Box.create(L)
    cell_dim = cells.choose_cell_dim(np.array([L] * 3), rc)
    C = 24
    cell_pos, cell_pid, ovf = build_cell_layout(
        jnp.asarray(pos_np), box, cell_dim, C)
    assert not bool(ovf)
    adj, shifts = build_cell_shifts(cell_dim, np.array([L] * 3))
    params = jnp.asarray([4.0, 4.0, rc * rc, 0.0], jnp.float32)
    f, pe, vir = fn(cell_pos, cell_dim, jnp.asarray(shifts, jnp.float32),
                    params, C=C, interpret=True)
    f_only = fn(cell_pos, cell_dim, jnp.asarray(shifts, jnp.float32),
                params, C=C, interpret=True, want_pv=False)
    assert np.abs(np.asarray(f_only) - np.asarray(f)).max() == 0.0

    pid = np.asarray(cell_pid).reshape(-1)
    sel = pid < N
    force = np.zeros((N, 3))
    force[pid[sel]] = np.asarray(f).reshape(-1, 3)[sel]
    p64 = pos_np.astype(np.float64)
    dr = p64[:, None] - p64[None, :]
    dr -= L * np.round(dr / L)
    r2 = (dr ** 2).sum(-1)
    np.fill_diagonal(r2, 1e9)
    w = r2 < rc * rc
    r6 = 1.0 / r2 ** 3
    fd = np.where(w, (48 * r6 - 24) * r6 / r2, 0.0)
    f_ref = (fd[:, :, None] * dr).sum(1)
    pe_ref = 0.5 * np.where(w, 4 * r6 * (r6 - 1), 0.0).sum()
    vxx_ref = 0.5 * np.where(w, fd * dr[..., 0] * dr[..., 0], 0.0).sum()
    scale = np.abs(f_ref).max()
    np.testing.assert_allclose(force, f_ref, atol=5e-4 * scale)
    assert float(np.asarray(pe).sum()) == pytest.approx(pe_ref, abs=1e-2)
    vir_sum = np.asarray(vir).reshape(-1, 6)[sel].sum(0)
    assert vir_sum[0] == pytest.approx(vxx_ref, rel=1e-3)


@pytest.mark.parametrize("name,pnames,vals", [
    ("gauss", ("epsilon", "sigma2"), [1.0, 0.64]),
    ("morse", ("D0", "alpha", "r0"), [0.5, 3.0, 1.0]),
    ("yukawa", ("epsilon", "kappa"), [1.5, 1.0]),
])
def test_generic_planar_kernel_matches_xla(name, pnames, vals):
    """The evaluator-generic planar kernel vs the generic XLA roll
    formulation on a physical (non-overlapping) configuration."""
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    from hoomd_tpu.ops import cells
    from hoomd_tpu.ops.pallas_pair import (build_cell_layout,
                                           build_cell_shifts,
                                           cell_pair_planar,
                                           cell_pair_xla)
    rng = np.random.RandomState(0)
    n, a = 6, 1.4
    N, L = n ** 3, n * 1.4
    grid = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing='ij'),
                    -1).reshape(-1, 3)
    pos_np = ((grid + 0.5) * a - L / 2
              + rng.uniform(-0.2, 0.2, (N, 3))).astype(np.float32)
    box = Box.create(L)
    cell_dim = cells.choose_cell_dim(np.array([L] * 3), 2.0)
    C = 24
    cp, pid, ovf = build_cell_layout(jnp.asarray(pos_np), box,
                                     cell_dim, C)
    adj, sh = build_cell_shifts(cell_dim, np.array([L] * 3))
    sh = jnp.asarray(sh, jnp.float32)
    pv = jnp.asarray([4.0, 0.0] + vals, jnp.float32)
    f1, pe1, v1 = cell_pair_planar(cp, cell_dim, sh, pv, C=C,
                                   eval_name=name, pnames=tuple(pnames),
                                   interpret=True)
    f2, pe2, v2 = cell_pair_xla(cp, cell_dim, sh, pv, eval_name=name,
                                pnames=tuple(pnames))
    scale = max(float(jnp.max(jnp.abs(f2))), 1.0)
    assert float(jnp.max(jnp.abs(f1 - f2))) < 5e-4 * scale
    assert float(jnp.abs(jnp.sum(pe1) - jnp.sum(pe2))) < 1e-2


def test_multitype_planar_kernel_matches_xla():
    """One-hot coefficient mixing in the planar kernel vs the gathering
    XLA formulation, 3 types with asymmetric coefficients + cutoffs."""
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    from hoomd_tpu.ops import cells
    from hoomd_tpu.ops.pallas_pair import (build_cell_layout,
                                           build_cell_shifts,
                                           cell_pair_planar,
                                           cell_pair_xla)
    from hoomd_tpu.ops.cells import bin_particles
    rng = np.random.RandomState(1)
    n, a = 6, 1.4
    N, L = n ** 3, n * 1.4
    grid = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing='ij'),
                    -1).reshape(-1, 3)
    pos_np = ((grid + 0.5) * a - L / 2
              + rng.uniform(-0.2, 0.2, (N, 3))).astype(np.float32)
    tid_np = rng.randint(0, 3, N)
    box = Box.create(L)
    cell_dim = cells.choose_cell_dim(np.array([L] * 3), 2.0)
    C = 24
    cp, pid, ovf = build_cell_layout(jnp.asarray(pos_np), box,
                                     cell_dim, C)
    # types follow the same layout permutation
    pidn = np.asarray(pid).reshape(-1)
    typ = np.zeros(pidn.shape, np.int32)
    sel = pidn < N
    typ[sel] = tid_np[pidn[sel]]
    typ = jnp.asarray(typ.reshape(cp.shape[0], C))
    adj, sh = build_cell_shifts(cell_dim, np.array([L] * 3))
    sh = jnp.asarray(sh, jnp.float32)
    T = 3
    eps = np.array([[1.0, 1.5, 0.7], [1.5, 0.5, 1.1], [0.7, 1.1, 2.0]])
    sig = np.array([[1.0, 0.8, 0.9], [0.8, 0.88, 1.0],
                    [0.9, 1.0, 0.75]])
    rc = np.array([[2.0, 1.8, 1.9], [1.8, 2.0, 1.7], [1.9, 1.7, 2.0]])
    s6 = sig ** 6
    lj1 = 4 * eps * s6 * s6
    lj2 = 4 * eps * s6
    pv = jnp.asarray(np.stack([rc * rc, np.zeros((T, T)), lj1, lj2,
                               rc]), jnp.float32)     # [rc2,eshift,*pn]
    pn = ('lj1', 'lj2', 'rcut')
    f1, pe1, v1 = cell_pair_planar(cp, cell_dim, sh, pv, C=C,
                                   eval_name='lj', pnames=pn,
                                   interpret=True, ntypes=T,
                                   cell_typ=typ)
    f2, pe2, v2 = cell_pair_xla(cp, cell_dim, sh, pv, eval_name='lj',
                                pnames=pn, ntypes=T, cell_typ=typ)
    scale = max(float(jnp.max(jnp.abs(f2))), 1.0)
    assert float(jnp.max(jnp.abs(f1 - f2))) < 5e-4 * scale
    assert float(jnp.abs(jnp.sum(pe1) - jnp.sum(pe2))) < 1e-2


def test_planar_n3l_kernel_matches_bruteforce():
    """Half-stencil Newton's-third-law kernel vs brute force (interpret
    mode; covers same-cell, neighbor and wrapped-image pairs)."""
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    from hoomd_tpu.ops.pallas_pair import (build_cell_layout,
                                           build_cell_shifts,
                                           cell_pair_planar_n3l)

    rng = np.random.RandomState(3)
    for n, a, cd, C in [(8, 1.2, (3, 3, 3), 48), (6, 1.6, (2, 2, 2), 80)]:
        g = np.arange(n) * a - n * a / 2
        X, Y, Z = np.meshgrid(g, g, g, indexing='ij')
        p = np.stack([X, Y, Z], -1).reshape(-1, 3)
        p += rng.uniform(-0.12, 0.12, p.shape)
        L = n * a
        p -= L * np.round(p / L)
        p = p.astype(np.float32)
        N = len(p)
        rc = 2.5
        box = Box.create(L)
        # brute-force oracle in f64
        p64 = p.astype(np.float64)
        dr = p64[:, None] - p64[None, :]
        dr -= L * np.round(dr / L)
        r2 = (dr ** 2).sum(-1)
        np.fill_diagonal(r2, 1e9)
        r6 = 1.0 / r2 ** 3
        fdv = np.where(r2 < rc * rc, (48 * r6 - 24) * r6 / r2, 0.0)
        F_bf = (fdv[:, :, None] * dr).sum(1)

        pv = jnp.asarray([rc * rc, 0.0, 4.0, 4.0], jnp.float32)
        _, shifts = build_cell_shifts(cd, np.array([L] * 3))
        shifts = jnp.asarray(shifts, jnp.float32)
        cp, pid, ovf = build_cell_layout(jnp.asarray(p), box, cd, C)
        assert not bool(ovf)
        F = cell_pair_planar_n3l(cp, cd, shifts, pv, C=C,
                                 eval_name='lj', pnames=('lj1', 'lj2'),
                                 interpret=True)
        pid_f = np.asarray(pid).reshape(-1)
        sel = pid_f < N
        fn = np.asarray(F).reshape(-1, 3)[sel]
        fbf = F_bf[pid_f[sel]]
        scale = np.abs(fbf).max()
        assert np.abs(fn - fbf).max() / scale < 2e-5


def test_plane_kernel_matches_planar():
    """cell_pair_plane (plane-blocked full stencil, deferred
    reductions) vs cell_pair_planar on a wrap-heavy small grid."""
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    from hoomd_tpu.ops import cells
    from hoomd_tpu.ops.pallas_pair import (build_cell_layout,
                                           build_cell_shifts,
                                           cell_pair_plane,
                                           cell_pair_planar)
    rng = np.random.RandomState(5)
    n, a = 6, 1.4
    N, L, rc = n ** 3, n * a, 2.0
    grid = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing='ij'),
                    -1).reshape(-1, 3)
    pos_np = ((grid + 0.5) * a - L / 2
              + rng.uniform(-0.2, 0.2, (N, 3))).astype(np.float32)
    box = Box.create(L)
    cell_dim = cells.choose_cell_dim(np.array([L] * 3), rc)
    C = 24
    cell_pos, cell_pid, ovf = build_cell_layout(
        jnp.asarray(pos_np), box, cell_dim, C)
    assert not bool(ovf)
    _, shifts = build_cell_shifts(cell_dim, np.array([L] * 3))
    shifts = jnp.asarray(shifts, jnp.float32)
    pv = jnp.asarray([rc * rc, 0.0, 4.0, 4.0], jnp.float32)
    f_ref = cell_pair_planar(cell_pos, cell_dim, shifts, pv, C=C,
                             eval_name='lj', pnames=('lj1', 'lj2'),
                             interpret=True, want_pv=False)
    f_new = cell_pair_plane(cell_pos, cell_dim, shifts, pv, C=C,
                            eval_name='lj', pnames=('lj1', 'lj2'),
                            interpret=True)
    fr = np.asarray(f_ref)
    fn = np.asarray(f_new)
    scale = np.abs(fr).max()
    np.testing.assert_allclose(fn, fr, atol=5e-5 * scale)


def test_plane_kernel_tiny_grids():
    """nz/ny/nx down to 2: the three plane inputs alias and the
    wrap shifts must still produce every periodic image once."""
    import jax.numpy as jnp
    from hoomd_tpu.box import Box
    from hoomd_tpu.ops.pallas_pair import (build_cell_layout,
                                           build_cell_shifts,
                                           cell_pair_plane,
                                           cell_pair_planar)
    rng = np.random.RandomState(7)
    N, L, rc = 24, 5.2, 2.5
    pos_np = rng.uniform(-L / 2, L / 2, (N, 3)).astype(np.float32)
    box = Box.create(L)
    cell_dim = (2, 2, 2)
    C = 24
    cell_pos, cell_pid, ovf = build_cell_layout(
        jnp.asarray(pos_np), box, cell_dim, C)
    _, shifts = build_cell_shifts(cell_dim, np.array([L] * 3))
    shifts = jnp.asarray(shifts, jnp.float32)
    pv = jnp.asarray([rc * rc, 0.0, 4.0, 4.0], jnp.float32)
    f_ref = cell_pair_planar(cell_pos, cell_dim, shifts, pv, C=C,
                             eval_name='lj', pnames=('lj1', 'lj2'),
                             interpret=True, want_pv=False)
    f_new = cell_pair_plane(cell_pos, cell_dim, shifts, pv, C=C,
                            eval_name='lj', pnames=('lj1', 'lj2'),
                            interpret=True)
    fr = np.asarray(f_ref)
    fn = np.asarray(f_new)
    scale = max(np.abs(fr).max(), 1.0)
    np.testing.assert_allclose(fn, fr, atol=5e-5 * scale)


@pytest.mark.parametrize("method,half", [
    ("nve", False), ("nvt", False),
    ("nvt", True), ("nvt", "lean"), ("nve", "lean")])
def test_megastep_kernel_matches_stepwise(method, half):
    """k fused VV steps in one pallas_call == k explicit python steps.

    Mirrors the per-step chain of the reference integrator
    (md/IntegratorTwoStep.cc:96-161 around TwoStepNVTMTK.cc:108 /
    TwoStepNVE.cc:76): drift, force, kick, Nose-Hoover scalars — all
    inside one window-resident kernel."""
    import jax.numpy as jnp
    from hoomd_tpu._config import PAD_COORD
    from hoomd_tpu.ops.pallas_pair import (build_cell_shifts,
                                           cell_megastep_plane,
                                           cell_pair_plane)

    cd = (4, 4, 4)
    C = 8
    L = 12.0
    nc = cd[0] * cd[1] * cd[2]
    rng = np.random.RandomState(3)
    occ = 5
    N = nc * occ
    w = L / np.array(cd)
    ids = np.arange(nc)
    org = np.stack([ids % cd[0] * w[0], ids // cd[0] % cd[1] * w[1],
                    ids // (cd[0] * cd[1]) * w[2]], -1) - L / 2
    pos = np.full((nc, C, 3), float(PAD_COORD), np.float32)
    # non-overlapping sub-lattice inside each cell (min sep ~1.3 > sigma)
    # so the LJ dynamics stay mild and the stepwise comparison is tight
    offs = np.array([[0.25, 0.25, 0.25], [0.75, 0.75, 0.25],
                     [0.75, 0.25, 0.75], [0.25, 0.75, 0.75],
                     [0.5, 0.5, 0.5]], np.float32)[:occ]
    pos[:, :occ, :] = (org[:, None, :] + offs[None] * w
                       + (rng.rand(nc, occ, 3).astype(np.float32) - 0.5)
                       * 0.1 * w)
    vel = np.zeros((nc, C, 3), np.float32)
    vel[:, :occ, :] = rng.randn(nc, occ, 3).astype(np.float32) * 0.3
    mass = np.ones((nc, C), np.float32)

    pos = jnp.asarray(pos)
    vel = jnp.asarray(vel)
    mass = jnp.asarray(mass)
    sh = jnp.asarray(build_cell_shifts(cd, (L,) * 3)[1], jnp.float32)
    pv = jnp.asarray([6.25, 0.0, 4.0, 4.0], jnp.float32)
    dt = jnp.float32(0.002)
    skin, k, kT, tau = 0.5, 3, 1.0, 0.7
    ndof = 3.0 * N

    def force(p):
        return cell_pair_plane(p, cd, sh, pv, C=C, recip='div',
                               interpret=True)

    def ref_run():
        p, v = pos, vel
        f = force(p)
        xi = jnp.float32(0.05)
        eta = jnp.float32(0.0)
        h = 0.5 * dt
        for _ in range(k):
            if method == 'nvt':
                ke2 = jnp.sum(mass[..., None] * v * v)
                xi1 = xi + h * (ke2 / (ndof * kT) - 1.0) / tau ** 2
                s = jnp.exp(-h * xi1)
                eta = eta + dt * xi1
            else:
                xi1, s = xi, 1.0
            v = s * v + h * f
            p = p + dt * v
            f = force(p)
            v = v + h * f
            if method == 'nvt':
                v = v * s
                ke2n = jnp.sum(mass[..., None] * v * v)
                xi = xi1 + h * (ke2n / (ndof * kT) - 1.0) / tau ** 2
        return p, v, f, xi, eta

    kt = jnp.full((k,), kT, jnp.float32)
    p2, v2, f2, xi2, eta2, danger, _, _ = cell_megastep_plane(
        pos, vel, jnp.asarray(force(pos)), mass, 1.0 / mass, cd, sh, pv,
        dt, kt, jnp.float32(0.05), jnp.float32(0.0), skin, C=C, k=k,
        method=method, recip='div', ndof=ndof,
        tau_inv2=jnp.float32(1.0 / tau ** 2), interpret=True, half=half)
    p1, v1, f1, xi1, eta1 = ref_run()
    m = np.abs(np.asarray(pos)[..., 0]) < 1e8

    def err(a, b):
        return float(np.max(np.abs(np.where(m[..., None],
                                            np.asarray(a - b), 0.0))))
    assert err(p1, p2) < 1e-5
    assert err(v1, v2) < 1e-4
    assert abs(float(xi1 - xi2)) <= 1e-6 * (abs(float(xi1)) + 1.0)
    assert abs(float(eta1 - eta2)) <= 1e-6 * (abs(float(eta1)) + 1.0)


def test_megastep_danger_flag():
    """Frozen state -> danger False; the skin monitor only fires on
    real displacement past (skin/2)^2."""
    import jax.numpy as jnp
    from hoomd_tpu._config import PAD_COORD
    from hoomd_tpu.ops.pallas_pair import (build_cell_shifts,
                                           cell_megastep_plane)

    cd = (4, 4, 4)
    C = 8
    L = 12.0
    nc = cd[0] * cd[1] * cd[2]
    rng = np.random.RandomState(5)
    w = L / np.array(cd)
    ids = np.arange(nc)
    org = np.stack([ids % cd[0] * w[0], ids // cd[0] % cd[1] * w[1],
                    ids // (cd[0] * cd[1]) * w[2]], -1) - L / 2
    pos = np.full((nc, C, 3), float(PAD_COORD), np.float32)
    pos[:, :4, :] = org[:, None, :] + 0.5 * w
    pos = jnp.asarray(pos)
    zeros = jnp.zeros((nc, C, 3), jnp.float32)
    mass = jnp.ones((nc, C), jnp.float32)
    sh = jnp.asarray(build_cell_shifts(cd, (L,) * 3)[1], jnp.float32)
    pv0 = jnp.asarray([1e-6, 0.0, 4.0, 4.0], jnp.float32)
    kt = jnp.ones((3,), jnp.float32)
    _, _, _, _, _, danger, _, _ = cell_megastep_plane(
        pos, zeros, zeros, mass, 1.0 / mass, cd, sh, pv0,
        jnp.float32(0.002), kt, jnp.float32(0.0), jnp.float32(0.0),
        0.5, C=C, k=3, method='nve', recip='div', ndof=3.0,
        interpret=True)
    assert not bool(danger)
    # ballistic drift past the threshold -> danger True
    v = jnp.full((nc, C, 3), 50.0, jnp.float32)
    _, _, _, _, _, danger, _, _ = cell_megastep_plane(
        pos, v, zeros, mass, 1.0 / mass, cd, sh, pv0,
        jnp.float32(0.002), kt, jnp.float32(0.0), jnp.float32(0.0),
        0.5, C=C, k=3, method='nve', recip='div', ndof=3.0,
        interpret=True)
    assert bool(danger)
