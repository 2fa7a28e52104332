"""Fused-sweep Pallas kernel for HPMC hard spheres.

The reference GPU runs one trial move per active cell per cell-set
pass, one thread block per cell, with the cell list in shared memory
(hpmc/IntegratorHPMCMonoGPU.cuh:124-160, .cu:34-152).  The TPU analog
here keeps the ENTIRE cell-major state resident in VMEM for a whole
sweep (R rounds x 8 parity sub-sweeps) inside ONE Pallas kernel:

  * planar SoA planes (nz, ny, nx*C): x/y/z positions, per-slot radius,
    move size, and liveness, with the C slots of cell x occupying lanes
    [x*C, (x+1)*C);
  * every sub-sweep proposes a trial for EVERY cell and commits only
    the cells of the active parity class (full-grid masked trials: the
    8x redundant proposal compute is cheaper on the VPU than any
    strided-active extraction, and it keeps all rolls STATIC);
  * candidate windows are 27 static rolls of the resident planes
    (z: untiled-dim roll, y: sublane roll, x: lane roll by C) — zero
    gathers, zero HBM traffic between sub-sweeps;
  * per-cell reductions (live count, mover extraction) and per-cell ->
    per-lane broadcasts run as one-hot indicator matmuls on the MXU;
  * trial randoms: the in-kernel PRNG (pltpu.prng_random_bits) on
    compiled TPU; interpret mode (CPU tests) instead reads threefry
    planes precomputed in XLA (prng_* has no interpret lowering, and a
    per-sub-sweep HBM DMA of (6,nz,ny,nx) violates Mosaic's 128-lane
    slice alignment anyway).  Box-Muller for the direction, u^(1/3)
    for the radius — the reference's move_translate ball distribution
    (Moves.h);
  * the kernel runs R rounds without re-binning: the stencil width is
    sized diam + 2*R*d_max so stale cell membership still covers every
    possible partner after up to R accepted moves per particle (the
    same invariant the reference's per-sweep cell list relies on).

One sweep = ONE bin + ONE plane build + ONE kernel + ONE scatter-back,
replacing the gather path's 32 sequential XLA sub-sweeps of serial
element gathers (measured 3 ms each on TPU at N=4k).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.jit,
    static_argnames=('cell_dim', 'C', 'R', 'box_L', 'interpret'))
def fused_sphere_sweep(px, py, pz, rad, dmv, live, perms, seed, randu,
                       *, cell_dim, C, R, box_L, interpret=False):
    """Run R rounds x 8 parity sub-sweeps of single-mover-per-cell
    sphere trials on resident planes.

    px/py/pz/rad/dmv/live: (nz, ny, nx*C) f32 planes (live is 1/0 and
    slots are a per-cell live prefix).  perms: (R*8,) i32 class order.
    seed: i32 scalar (compiled-TPU PRNG).  randu: (R*8, 6, nz, ny, nx)
    f32 uniforms (interpret mode only; pass a (1,1,1,1,1) dummy on
    TPU).  Returns (px', py', pz', n_accept, n_try).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = cell_dim
    NXC = nx * C
    Lx, Ly, Lz = (float(box_L[0]), float(box_L[1]), float(box_L[2]))
    f32 = jnp.float32

    offsets = [(dz, dy, dx) for dz in (-1, 0, 1)
               for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

    def kernel(perm_ref, seed_ref, px_ref, py_ref, pz_ref, rad_ref,
               dmv_ref, live_ref, randu_ref, opx_ref, opy_ref, opz_ref,
               cnt_ref):
        if not interpret:
            pltpu.prng_seed(seed_ref[0])
        opx_ref[:] = px_ref[:]
        opy_ref[:] = py_ref[:]
        opz_ref[:] = pz_ref[:]
        cnt_ref[0] = 0
        cnt_ref[1] = 0

        live = live_ref[:]                          # (nz, ny, NXC)
        rad = rad_ref[:]
        dmv = dmv_ref[:]

        # lane bookkeeping (static)
        lane = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, NXC), 2)
        lane_in_cell = lane % C
        # group indicator G (NXC, nx): lane l belongs to cell l//C
        gl = jax.lax.broadcasted_iota(jnp.int32, (NXC, nx), 0)
        gc = jax.lax.broadcasted_iota(jnp.int32, (NXC, nx), 1)
        G = (gl // C == gc).astype(f32)             # (NXC, nx)

        def gsum(a, exact=False):
            """(nz, ny, NXC) -> per-cell sum (nz, ny, nx).

            exact=True forces bf16x3 (Precision.HIGHEST): the MXU's
            single-pass bf16 quantizes f32 POSITION payloads to ~8
            mantissa bits (measured 2e-3 on unit coords), which would
            bias accepted positions; 0/1 indicators and small-int
            counts are bf16-exact and keep the default."""
            return jax.lax.dot_general(
                a, G, (((2,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=(jax.lax.Precision.HIGHEST if exact
                           else None))

        def bcast(a, exact=False):
            """(nz, ny, nx) per-cell -> (nz, ny, NXC) lanes."""
            return jax.lax.dot_general(
                a, G.T, (((2,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=(jax.lax.Precision.HIGHEST if exact
                           else None))

        cnt_c = gsum(live)                          # (nz, ny, nx)
        has_c = cnt_c > 0.5
        # per-cell parity indices
        zc = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 0) % 2
        yc = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 1) % 2
        xc = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 2) % 2

        two_pi = f32(2.0 * np.pi)

        def sub_sweep(idx, _):
            c = perm_ref[idx]
            pz_par = c // 4
            py_par = (c // 2) % 2
            px_par = c % 2
            pmask_c = ((zc == pz_par) & (yc == py_par)
                       & (xc == px_par))            # (nz, ny, nx)

            # -- per-cell randoms -------------------------------------
            if interpret:
                u_sel = randu_ref[idx, 0]
                u1 = randu_ref[idx, 1]
                u2 = randu_ref[idx, 2]
                u3 = randu_ref[idx, 3]
                u4 = randu_ref[idx, 4]
                u_r = randu_ref[idx, 5]
            else:
                def draw():
                    # raw bits may be SIGNED int32 — mask off the sign
                    # byte (logical-shift/uint casts are unsupported in
                    # Mosaic) so the int32->f32 cast lands in [0, 2^24)
                    bits = pltpu.bitcast(
                        pltpu.prng_random_bits((nz, ny, nx)),
                        jnp.int32)
                    return ((bits >> 8) & jnp.int32(0xFFFFFF)
                            ).astype(f32) * f32(1.0 / (1 << 24))
                u_sel = draw()
                u1 = draw()
                u2 = draw()
                u3 = draw()
                u4 = draw()
                u_r = draw()
            # Box-Muller: two gaussians from (u1, u2), one from (u3, u4)
            r1 = jnp.sqrt(-2.0 * jnp.log(u1 + f32(1e-12)))
            g1 = r1 * jnp.cos(two_pi * u2)
            g2 = r1 * jnp.sin(two_pi * u2)
            r2g = jnp.sqrt(-2.0 * jnp.log(u3 + f32(1e-12)))
            g3 = r2g * jnp.cos(two_pi * u4)
            gn = jax.lax.rsqrt(g1 * g1 + g2 * g2 + g3 * g3 + f32(1e-12))
            # radius ~ d * u^(1/3) (uniform in ball)
            rball = jnp.exp(jnp.log(u_r + f32(1e-12)) * f32(1.0 / 3.0))

            # -- mover selection --------------------------------------
            pick = jnp.minimum((u_sel * cnt_c).astype(jnp.int32),
                               jnp.maximum(cnt_c.astype(jnp.int32) - 1,
                                           0))
            pick_b = bcast(pick.astype(f32))
            onehot = ((lane_in_cell.astype(f32) - pick_b) == 0.0
                      ).astype(f32) * live          # (nz, ny, NXC)

            cpx = opx_ref[:]
            cpy = opy_ref[:]
            cpz = opz_ref[:]
            mx_c = gsum(cpx * onehot, exact=True)   # (nz, ny, nx)
            my_c = gsum(cpy * onehot, exact=True)
            mz_c = gsum(cpz * onehot, exact=True)
            mr_c = gsum(rad * onehot, exact=True)
            md_c = gsum(dmv * onehot, exact=True)

            step = md_c * rball * gn
            nxp = mx_c + g1 * step
            nyp = my_c + g2 * step
            nzp = mz_c + g3 * step
            # wrap into the box
            nxp = nxp - Lx * jnp.floor(nxp / Lx + 0.5)
            nyp = nyp - Ly * jnp.floor(nyp / Ly + 0.5)
            nzp = nzp - Lz * jnp.floor(nzp / Lz + 0.5)

            nxb = bcast(nxp, exact=True)
            nyb = bcast(nyp, exact=True)
            nzb = bcast(nzp, exact=True)
            mrb = bcast(mr_c, exact=True)

            # -- overlap count over the 27-cell windows ---------------
            oc = jnp.zeros((nz, ny, NXC), f32)
            for (dz, dy, dxo) in offsets:
                # pltpu.roll requires non-negative shifts
                sz = (-dz) % nz
                sy = (-dy) % ny
                sx = ((-dxo) % nx) * C

                def roll3(a):
                    r = a
                    if sz:
                        r = pltpu.roll(r, sz, 0)
                    if sy:
                        r = pltpu.roll(r, sy, 1)
                    if sx:
                        r = pltpu.roll(r, sx, 2)
                    return r
                wx = roll3(cpx)
                wy = roll3(cpy)
                wz = roll3(cpz)
                wl = roll3(live)
                wr = roll3(rad)
                ddx = nxb - wx
                ddx = ddx - Lx * jnp.round(ddx / Lx)
                ddy = nyb - wy
                ddy = ddy - Ly * jnp.round(ddy / Ly)
                ddz = nzb - wz
                ddz = ddz - Lz * jnp.round(ddz / Lz)
                rr = ddx * ddx + ddy * ddy + ddz * ddz
                thr = mrb + wr
                ind = (rr < thr * thr).astype(f32) * wl
                if (dz, dy, dxo) == (0, 0, 0):
                    ind = ind * (1.0 - onehot)
                oc = oc + ind
            occ_c = gsum(oc)                        # (nz, ny, nx)

            acc_c = (pmask_c & has_c & (occ_c < 0.5)).astype(f32)
            acc_b = bcast(acc_c)
            sel = onehot * acc_b                    # (nz, ny, NXC)
            opx_ref[:] = cpx + sel * (nxb - cpx)
            opy_ref[:] = cpy + sel * (nyb - cpy)
            opz_ref[:] = cpz + sel * (nzb - cpz)

            n_try = jnp.sum((pmask_c & has_c).astype(jnp.int32))
            n_acc = jnp.sum(acc_c.astype(jnp.int32))
            cnt_ref[0] = cnt_ref[0] + n_acc
            cnt_ref[1] = cnt_ref[1] + n_try
            return 0

        jax.lax.fori_loop(0, R * 8, sub_sweep, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nz, ny, NXC), f32),
            jax.ShapeDtypeStruct((nz, ny, NXC), f32),
            jax.ShapeDtypeStruct((nz, ny, NXC), f32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            # the 27-offset unrolled stencil's live tile chains overflow
            # the default 16M scoped-VMEM stack at production grids; the
            # chip has a 128M budget (same lesson as the MD megastep)
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(perms.astype(jnp.int32),
      jnp.reshape(jnp.asarray(seed, jnp.int32), (1,)),
      px, py, pz, rad, dmv, live, randu.astype(f32))
    npx, npy, npz, cnts = out
    return npx, npy, npz, cnts[0], cnts[1]


@functools.partial(
    jax.jit,
    static_argnames=('cell_dim', 'C', 'R', 'box_L', 'tables',
                     'interpret'))
def fused_poly_sweep(px, py, pz, qw, qx, qy, qz, live, perms, seed,
                     randu, mp, *, cell_dim, C, R, box_L, tables,
                     interpret=False):
    """Fused checkerboard sweep for single-type convex polyhedra.

    Same structure as fused_sphere_sweep (full-grid masked trials,
    VMEM-resident planes, 27-window stencil) with rotation moves and a
    branch-free SAT narrow phase (the TPU-native replacement for the
    reference's XenoCollide MPR, hpmc/ShapeConvexPolyhedron.h): per
    candidate pair the separating axes are A's face normals (static in
    A's frame), B's face normals (S-mapped), and edge-cross products,
    with support intervals over the static vertex table.  S = R(q_rel)
    with q_rel = conj(q_A) * q_B, so all per-axis work happens in A's
    body frame and A's own supports are compile-time constants.

    qw..qz: orientation planes.  mp: (3,) f32 [d, a, move_ratio]
    (traced move parameters).  tables: (V, F, E) as nested tuples of
    floats (static).  randu: (R*8, 12, nz, ny, nx) uniforms for
    interpret mode (dummy (1,1,1,1,1) on TPU).
    Returns (px', py', pz', qw', qx', qy', qz', counts(4,)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = cell_dim
    NXC = nx * C
    Lx, Ly, Lz = (float(box_L[0]), float(box_L[1]), float(box_L[2]))
    f32 = jnp.float32
    V = np.asarray(tables[0], np.float32)           # (NV, 3)
    Fn = np.asarray(tables[1], np.float32)          # (NF, 3)
    Ed = np.asarray(tables[2], np.float32)          # (NE, 3)
    NV, NF, NE = len(V), len(Fn), len(Ed)
    # static A-frame face supports
    projA = Fn @ V.T                                # (NF, NV)
    loA_f = projA.min(axis=1)
    hiA_f = projA.max(axis=1)
    EPS = 1e-7

    # (dz, dy) rows ride a fori_loop with DYNAMIC z/y rolls (supported
    # at any lane width); dx is unrolled over 3 statically x-rolled
    # plane variants — dynamic LANE rolls require 128-aligned lane
    # dims, which nx*C rarely is
    offs9 = [(dz, dy) for dz in (-1, 0, 1) for dy in (-1, 0, 1)]
    shifts_np = np.asarray(
        [[(-dz) % nz, (-dy) % ny] for (dz, dy) in offs9],
        np.int32).reshape(-1)
    c_center9 = offs9.index((0, 0))

    def kernel(perm_ref, seed_ref, shift_ref, mp_ref,
               px_ref, py_ref, pz_ref, qw_ref, qx_ref, qy_ref, qz_ref,
               live_ref, randu_ref,
               opx_ref, opy_ref, opz_ref, oqw_ref, oqx_ref, oqy_ref,
               oqz_ref, cnt_ref):
        if not interpret:
            pltpu.prng_seed(seed_ref[0])
        opx_ref[:] = px_ref[:]
        opy_ref[:] = py_ref[:]
        opz_ref[:] = pz_ref[:]
        oqw_ref[:] = qw_ref[:]
        oqx_ref[:] = qx_ref[:]
        oqy_ref[:] = qy_ref[:]
        oqz_ref[:] = qz_ref[:]
        for i in range(4):
            cnt_ref[i] = 0

        live = live_ref[:]
        lane = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, NXC), 2)
        lane_in_cell = lane % C
        gl = jax.lax.broadcasted_iota(jnp.int32, (NXC, nx), 0)
        gc = jax.lax.broadcasted_iota(jnp.int32, (NXC, nx), 1)
        G = (gl // C == gc).astype(f32)

        def gsum(a, exact=False):
            return jax.lax.dot_general(
                a, G, (((2,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=(jax.lax.Precision.HIGHEST if exact
                           else None))

        def bcast(a, exact=False):
            return jax.lax.dot_general(
                a, G.T, (((2,), (0,)), ((), ())),
                preferred_element_type=f32,
                precision=(jax.lax.Precision.HIGHEST if exact
                           else None))

        cnt_c = gsum(live)
        has_c = cnt_c > 0.5
        zc = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 0) % 2
        yc = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 1) % 2
        xc = jax.lax.broadcasted_iota(jnp.int32, (nz, ny, nx), 2) % 2
        two_pi = f32(2.0 * np.pi)
        d_mv = mp_ref[0]
        a_mv = mp_ref[1]
        m_ratio = mp_ref[2]

        def rsqrt_exact(x):
            """rsqrt + one Newton step: Mosaic's rsqrt is a coarse
            approximation (~1e-3 rel observed), and a mis-normalized
            trial quaternion SCALES the rotated vertices — the
            compiled kernel accepted grazing configurations the exact
            SAT counts as overlapping (58 shallow overlaps at depth
            ~1e-3 after 20 sweeps; zero after this refinement)."""
            r = jax.lax.rsqrt(x)
            return r * (1.5 - 0.5 * x * r * r)

        def quat_to_R(w, x, y, z):
            """Rows of the rotation matrix R(q) (body -> frame)."""
            return (
                (1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)),
                (2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)),
                (2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)),
            )

        def sub_sweep(idx, _):
            c = perm_ref[idx]
            pz_par = c // 4
            py_par = (c // 2) % 2
            px_par = c % 2
            pmask_c = ((zc == pz_par) & (yc == py_par)
                       & (xc == px_par))

            if interpret:
                u = [randu_ref[idx, k] for k in range(12)]
            else:
                def draw():
                    bits = pltpu.bitcast(
                        pltpu.prng_random_bits((nz, ny, nx)),
                        jnp.int32)
                    return ((bits >> 8) & jnp.int32(0xFFFFFF)
                            ).astype(f32) * f32(1.0 / (1 << 24))
                u = [draw() for _ in range(12)]
            u_sel, u_mr, u1, u2, u3, u4, u_r, a1, a2, a3, a4, u_ang = u

            # translate: ball-uniform (Box-Muller direction, u^(1/3))
            r1 = jnp.sqrt(-2.0 * jnp.log(u1 + f32(1e-12)))
            g1 = r1 * jnp.cos(two_pi * u2)
            g2 = r1 * jnp.sin(two_pi * u2)
            g3 = jnp.sqrt(-2.0 * jnp.log(u3 + f32(1e-12))) \
                * jnp.cos(two_pi * u4)
            gn = rsqrt_exact(g1 * g1 + g2 * g2 + g3 * g3
                             + f32(1e-12))
            rball = jnp.exp(jnp.log(u_r + f32(1e-12)) * f32(1. / 3.))
            # rotate: random axis + uniform angle in [-a, a]
            # (reference Moves.h move_rotate)
            b1 = jnp.sqrt(-2.0 * jnp.log(a1 + f32(1e-12)))
            h1 = b1 * jnp.cos(two_pi * a2)
            h2 = b1 * jnp.sin(two_pi * a2)
            h3 = jnp.sqrt(-2.0 * jnp.log(a3 + f32(1e-12))) \
                * jnp.cos(two_pi * a4)
            hn = rsqrt_exact(h1 * h1 + h2 * h2 + h3 * h3
                             + f32(1e-12))
            half = 0.5 * (2.0 * u_ang - 1.0) * a_mv
            dqw = jnp.cos(half)
            s_h = jnp.sin(half) * hn
            dqx = s_h * h1
            dqy = s_h * h2
            dqz = s_h * h3
            do_rot = (u_mr > m_ratio).astype(f32)   # (nz, ny, nx)

            pick = jnp.minimum((u_sel * cnt_c).astype(jnp.int32),
                               jnp.maximum(cnt_c.astype(jnp.int32) - 1,
                                           0))
            pick_b = bcast(pick.astype(f32))
            onehot = ((lane_in_cell.astype(f32) - pick_b) == 0.0
                      ).astype(f32) * live

            cpx = opx_ref[:]
            cpy = opy_ref[:]
            cpz = opz_ref[:]
            cqw = oqw_ref[:]
            cqx = oqx_ref[:]
            cqy = oqy_ref[:]
            cqz = oqz_ref[:]
            mx = gsum(cpx * onehot, exact=True)
            my = gsum(cpy * onehot, exact=True)
            mz = gsum(cpz * onehot, exact=True)
            mqw = gsum(cqw * onehot, exact=True)
            mqx = gsum(cqx * onehot, exact=True)
            mqy = gsum(cqy * onehot, exact=True)
            mqz = gsum(cqz * onehot, exact=True)

            step = d_mv * rball * gn * (1.0 - do_rot)
            nxp = mx + g1 * step
            nyp = my + g2 * step
            nzp = mz + g3 * step
            nxp = nxp - Lx * jnp.floor(nxp / Lx + 0.5)
            nyp = nyp - Ly * jnp.floor(nyp / Ly + 0.5)
            nzp = nzp - Lz * jnp.floor(nzp / Lz + 0.5)
            # q_new = normalize(dq * q_old) when rotating
            rw = dqw * mqw - dqx * mqx - dqy * mqy - dqz * mqz
            rx = dqw * mqx + dqx * mqw + dqy * mqz - dqz * mqy
            ry = dqw * mqy - dqx * mqz + dqy * mqw + dqz * mqx
            rz = dqw * mqz + dqx * mqy - dqy * mqx + dqz * mqw
            rn = rsqrt_exact(rw * rw + rx * rx + ry * ry + rz * rz
                             + f32(1e-12))
            nqw = jnp.where(do_rot > 0, rw * rn, mqw)
            nqx = jnp.where(do_rot > 0, rx * rn, mqx)
            nqy = jnp.where(do_rot > 0, ry * rn, mqy)
            nqz = jnp.where(do_rot > 0, rz * rn, mqz)

            nxb = bcast(nxp, exact=True)
            nyb = bcast(nyp, exact=True)
            nzb = bcast(nzp, exact=True)
            qwb = bcast(nqw, exact=True)
            qxb = bcast(nqx, exact=True)
            qyb = bcast(nqy, exact=True)
            qzb = bcast(nqz, exact=True)
            # A-side rotation rows (per lane, reused across offsets)
            RA = quat_to_R(qwb, qxb, qyb, qzb)

            oc0 = jnp.zeros((nz, ny, NXC), f32)
            # statically x-rolled plane variants (lane rolls by C);
            # all 27 windows use STATIC shifts — dynamic rolls are
            # rejected by Mosaic in this kernel at unaligned lane
            # widths, and static rolls compile at any width (the
            # sphere kernel is the proof)
            planes8 = (cpx, cpy, cpz, cqw, cqx, cqy, cqz, live)
            xvar = {0: planes8}
            for dxo in (-1, 1):
                sx = ((-dxo) % nx) * C
                xvar[dxo] = tuple(pltpu.roll(p, sx, 2)
                                  for p in planes8)

            def one_window(dz, dy, dxo, oc):
                sz = (-dz) % nz
                sy = (-dy) % ny

                def roll3(a):
                    r = pltpu.roll(a, sz, 0) if sz else a
                    return pltpu.roll(r, sy, 1) if sy else r
                wx, wy, wz, ww, wqx, wqy, wqz, wl = (
                    roll3(p) for p in xvar[dxo])
                dgx = wx - nxb
                dgx = dgx - Lx * jnp.round(dgx / Lx)
                dgy = wy - nyb
                dgy = dgy - Ly * jnp.round(dgy / Ly)
                dgz = wz - nzb
                dgz = dgz - Lz * jnp.round(dgz / Lz)
                # dr in A's body frame: R_A^T dr (rows of RA are
                # R's rows; R^T dr = columns dotted)
                drx = RA[0][0] * dgx + RA[1][0] * dgy + RA[2][0] * dgz
                dry = RA[0][1] * dgx + RA[1][1] * dgy + RA[2][1] * dgz
                drz = RA[0][2] * dgx + RA[1][2] * dgy + RA[2][2] * dgz
                # q_rel = conj(q_A) * q_B; S = R(q_rel) maps B-body
                # vectors into A's frame
                sw = qwb * ww + qxb * wqx + qyb * wqy + qzb * wqz
                sx_ = qwb * wqx - qxb * ww - qyb * wqz + qzb * wqy
                sy_ = qwb * wqy + qxb * wqz - qyb * ww - qzb * wqx
                sz_ = qwb * wqz - qxb * wqy + qyb * wqx - qzb * ww
                S = quat_to_R(sw, sx_, sy_, sz_)

                def Sv(v):
                    """S @ v for a static 3-vector v."""
                    return (S[0][0] * v[0] + S[0][1] * v[1]
                            + S[0][2] * v[2],
                            S[1][0] * v[0] + S[1][1] * v[1]
                            + S[1][2] * v[2],
                            S[2][0] * v[0] + S[2][1] * v[1]
                            + S[2][2] * v[2])

                def STc(cx_, cy_, cz_):
                    """S^T @ c for per-lane c."""
                    return (S[0][0] * cx_ + S[1][0] * cy_
                            + S[2][0] * cz_,
                            S[0][1] * cx_ + S[1][1] * cy_
                            + S[2][1] * cz_,
                            S[0][2] * cx_ + S[1][2] * cy_
                            + S[2][2] * cz_)

                def supports(cx_, cy_, cz_):
                    """min/max over the static vertex table of c.v."""
                    lo = hi = None
                    for k in range(NV):
                        p = (cx_ * float(V[k, 0]) + cy_ * float(V[k, 1])
                             + cz_ * float(V[k, 2]))
                        lo = p if lo is None else jnp.minimum(lo, p)
                        hi = p if hi is None else jnp.maximum(hi, p)
                    return lo, hi

                sep = jnp.zeros((nz, ny, NXC), bool)
                # A's face normals (static in A frame)
                for i_f in range(NF):
                    n = Fn[i_f]
                    t = (drx * float(n[0]) + dry * float(n[1])
                         + drz * float(n[2]))
                    cb = STc(f32(float(n[0])), f32(float(n[1])),
                             f32(float(n[2])))
                    loB, hiB = supports(*cb)
                    sep = sep | (float(loA_f[i_f])
                                 > t + hiB + EPS) \
                        | (t + loB > float(hiA_f[i_f]) + EPS)
                # B's face normals (static in B frame -> S-mapped)
                for j_f in range(NF):
                    cA = Sv(tuple(float(x) for x in Fn[j_f]))
                    t = drx * cA[0] + dry * cA[1] + drz * cA[2]
                    loA, hiA = supports(*cA)
                    # B supports along its own face normal are static
                    loB = float(loA_f[j_f])
                    hiB = float(hiA_f[j_f])
                    sep = sep | (loA > t + hiB + EPS) \
                        | (t + loB > hiA + EPS)
                # edge-cross axes
                SE = [Sv(tuple(float(x) for x in Ed[j_e]))
                      for j_e in range(NE)]
                for i_e in range(NE):
                    e = tuple(float(x) for x in Ed[i_e])
                    for j_e in range(NE):
                        b = SE[j_e]
                        cx_ = e[1] * b[2] - e[2] * b[1]
                        cy_ = e[2] * b[0] - e[0] * b[2]
                        cz_ = e[0] * b[1] - e[1] * b[0]
                        t = drx * cx_ + dry * cy_ + drz * cz_
                        loA, hiA = supports(cx_, cy_, cz_)
                        cb = STc(cx_, cy_, cz_)
                        loB, hiB = supports(*cb)
                        sep = sep | (loA > t + hiB + EPS) \
                            | (t + loB > hiA + EPS)
                ind = (~sep).astype(f32) * wl
                if (dz, dy, dxo) == (0, 0, 0):
                    ind = ind * (1.0 - onehot)
                return oc + ind

            oc = oc0
            for (dz, dy) in offs9:
                for dxo in (-1, 0, 1):
                    oc = one_window(dz, dy, dxo, oc)
            occ_c = gsum(oc)

            acc_c = (pmask_c & has_c & (occ_c < 0.5)).astype(f32)
            acc_b = bcast(acc_c)
            sel = onehot * acc_b
            opx_ref[:] = cpx + sel * (nxb - cpx)
            opy_ref[:] = cpy + sel * (nyb - cpy)
            opz_ref[:] = cpz + sel * (nzb - cpz)
            oqw_ref[:] = cqw + sel * (qwb - cqw)
            oqx_ref[:] = cqx + sel * (qxb - cqx)
            oqy_ref[:] = cqy + sel * (qyb - cqy)
            oqz_ref[:] = cqz + sel * (qzb - cqz)

            tr_c = pmask_c & has_c
            rot_f = do_rot > 0
            cnt_ref[0] = cnt_ref[0] + jnp.sum(
                (acc_c > 0) & ~rot_f, dtype=jnp.int32)
            cnt_ref[1] = cnt_ref[1] + jnp.sum(
                tr_c & ~rot_f, dtype=jnp.int32)
            cnt_ref[2] = cnt_ref[2] + jnp.sum(
                (acc_c > 0) & rot_f, dtype=jnp.int32)
            cnt_ref[3] = cnt_ref[3] + jnp.sum(
                tr_c & rot_f, dtype=jnp.int32)
            return 0

        jax.lax.fori_loop(0, R * 8, sub_sweep, 0)

    out = pl.pallas_call(
        kernel,
        out_shape=tuple(
            [jax.ShapeDtypeStruct((nz, ny, NXC), f32)] * 7
            + [jax.ShapeDtypeStruct((4,), jnp.int32)]),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=tuple(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(perms.astype(jnp.int32),
      jnp.reshape(jnp.asarray(seed, jnp.int32), (1,)),
      jnp.asarray(shifts_np),
      mp.astype(f32),
      px, py, pz, qw, qx, qy, qz, live, randu.astype(f32))
    return out
