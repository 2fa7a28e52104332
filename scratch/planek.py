"""Experiment: plane-blocked n3l planar kernel, grid (nz,).

Each grid step processes one full z-plane (ny, nx, C) of i-particles
against the half stencil {(0,0),(0,1),(1,-1),(1,0),(1,1)} with all
(dz, dy, dx) offsets STATIC in-kernel (y handled by static
concat-rolls, x by static sublane rolls, z by the block index map).
j-side (Newton) contributions accumulate into two plane buffers:
same-plane (added to the i-side output) and upper-plane (side output
summed outside).  Compare force vs cell_pair_planar_n3l and time.
"""
import sys; sys.path.insert(0, "/root/repo")
import functools
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from hoomd_tpu.ops.pallas_pair import (cell_pair_planar_n3l,
                                       build_cell_shifts)
from hoomd_tpu._config import PAD_COORD


def _roll_rows(a, dy):
    """rows[(iy+dy) % ny] along axis 1 of (3, ny, nx, C), static dy."""
    if dy == 0:
        return a
    return jnp.concatenate([a[:, dy:], a[:, :dy]], axis=1) if dy > 0 \
        else jnp.concatenate([a[:, dy:], a[:, :dy]], axis=1)


def _kernel_plane(lj_ref, j0_ref, j1_ref, xi_ref, sx_ref, f_ref, fj_ref,
                  *, ny, YB):
    C = j0_ref.shape[-1]
    rc2 = lj_ref[0, 0]
    lj1 = lj_ref[0, 2]
    lj2 = lj_ref[0, 3]
    Ly = lj_ref[0, 5]
    Lz = lj_ref[0, 6]
    iz = pl.program_id(0)
    nz = pl.num_programs(0)
    nx = j0_ref.shape[-2]

    p0 = j0_ref[:, 0]            # (3, ny, nx, C)
    p1 = j1_ref[:, 0]
    szw = jnp.where(iz == nz - 1, Lz, 0.0)   # z-wrap shift, upper plane
    xi = xi_ref[:, 0]            # (3, ny, nx, C, 1)
    sx = sx_ref[...]             # (3, nx, C)

    offs = ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))

    def rollx(comp, s):          # comp (YB, nx, C): dx = -1/0/+1 cells
        rm = jnp.concatenate([comp[:, -1:], comp[:, :-1]], axis=1)
        rp = jnp.concatenate([comp[:, 1:], comp[:, :1]], axis=1)
        if s is not None:
            rm = rm + s[0]
            rp = rp + s[2]
        return rm, comp, rp

    lane = jax.lax.broadcasted_iota(jnp.int32, (C, 3 * C), 1)
    isub = jax.lax.broadcasted_iota(jnp.int32, (C, 3 * C), 0)
    keep = ((lane >= 2 * C)
            | ((lane >= C) & (isub < lane - C))).astype(jnp.float32)

    nchunk = ny // YB
    Fp = None                    # i-side full plane (3, ny, nx, C)
    G0 = None                    # same-plane j-side
    G1 = None                    # upper-plane j-side

    for (dz, dy) in offs:
        self_blk = (dz == 0 and dy == 0)
        src = p0 if dz == 0 else p1
        fch = [[], [], []]
        gch = [[], [], []]
        for ci in range(nchunk):
            y0 = ci * YB
            xi_x = xi[0, y0:y0 + YB]      # (YB, nx, C, 1)
            xi_y = xi[1, y0:y0 + YB]
            xi_z = xi[2, y0:y0 + YB]
            ylo = y0 + dy
            # j rows [ylo, ylo+YB) mod ny: at most two static segments;
            # wrapped rows get +/- Ly on the y component
            def seg(comp_i, add_y=False):
                c = src[comp_i]
                lo, hi = ylo, ylo + YB
                if lo >= 0 and hi <= ny:
                    return c[lo:hi]
                if lo < 0:      # wrap at bottom: rows [ny+lo, ny) first
                    a = c[ny + lo:]
                    if add_y:
                        a = a - Ly
                    return jnp.concatenate([a, c[:hi]], axis=0)
                # hi > ny: rows [lo, ny) then [0, hi-ny) wrapped
                b = c[:hi - ny]
                if add_y:
                    b = b + Ly
                return jnp.concatenate([c[lo:], b], axis=0)
            jx_b = seg(0)
            jy_b = seg(1, add_y=True)
            jz_b = seg(2)
            if dz == 1:
                jz_b = jz_b + szw
            xm, x0c, xp = rollx(jx_b, sx)
            jxw = jnp.concatenate([xm, x0c, xp], axis=-1)  # (YB,nx,3C)
            ym, yc, yp = rollx(jy_b, None)
            jyw = jnp.concatenate([ym, yc, yp], axis=-1)
            zm, zc, zp = rollx(jz_b, None)
            jzw = jnp.concatenate([zm, zc, zp], axis=-1)

            drx = xi_x - jxw[:, :, None, :]   # (YB, nx, C, 3C)
            dry = xi_y - jyw[:, :, None, :]
            drz = xi_z - jzw[:, :, None, :]
            r2 = drx * drx + dry * dry + drz * drz
            r2s = jnp.maximum(r2, 1e-3)
            cut = r2 < rc2
            r2i = 1.0 / r2s
            r6i = r2i * r2i * r2i
            fdivr = jnp.where(
                cut, r2i * r6i * (12.0 * lj1 * r6i - 6.0 * lj2), 0.0)
            if self_blk:
                fdivr = fdivr * keep[None, None]
            px = fdivr * drx
            py = fdivr * dry
            pz = fdivr * drz
            fch[0].append(jnp.sum(px, axis=-1))
            fch[1].append(jnp.sum(py, axis=-1))
            fch[2].append(jnp.sum(pz, axis=-1))

            def foldx(Gw):       # (YB, nx, 3C) -> (YB, nx, C)
                Gm, Gc, Gp = (Gw[:, :, :C], Gw[:, :, C:2 * C],
                              Gw[:, :, 2 * C:])
                return (jnp.concatenate([Gm[:, 1:], Gm[:, :1]], axis=1)
                        + Gc
                        + jnp.concatenate([Gp[:, -1:], Gp[:, :-1]],
                                          axis=1))
            gch[0].append(foldx(jnp.sum(px, axis=2)))
            gch[1].append(foldx(jnp.sum(py, axis=2)))
            gch[2].append(foldx(jnp.sum(pz, axis=2)))

        Fo = jnp.stack([jnp.concatenate(fch[c], axis=0)
                        for c in range(3)])       # (3, ny, nx, C)
        Go = jnp.stack([jnp.concatenate(gch[c], axis=0)
                        for c in range(3)])
        # scatter j-side: Gj[(iy+dy) % ny] += -Go[iy]  <=>
        # Gj = -roll_rows(Go, -dy)
        Gj = -_roll_rows(Go, -dy)
        Fp = Fo if Fp is None else Fp + Fo
        if dz == 0:
            G0 = Gj if G0 is None else G0 + Gj
        else:
            G1 = Gj if G1 is None else G1 + Gj

    f_ref[:, 0] = Fp + G0
    fj_ref[:, 0] = G1


@functools.partial(jax.jit, static_argnames=('cell_dim', 'C', 'YB'))
def plane_n3l(cell_pos, cell_dim, box_L, lj_params, *, C, YB):
    nx, ny, nz = cell_dim
    nc = nx * ny * nz
    dt = cell_pos.dtype
    g = cell_pos.reshape(nz, ny, nx, C, 3)
    gp = jnp.transpose(g, (4, 0, 1, 2, 3))
    gt = gp[..., None]
    Lx, Ly, Lz = box_L
    ar = jnp.arange(nx)
    sx = jnp.stack([jnp.where(ar == 0, -Lx, 0.0),
                    jnp.zeros((nx,), dt),
                    jnp.where(ar == nx - 1, Lx, 0.0)])
    sx = jnp.broadcast_to(sx[:, :, None], (3, nx, C))
    par = jnp.concatenate([lj_params, jnp.asarray([Lx, Ly, Lz], dt)])

    j0_spec = pl.BlockSpec((3, 1, ny, nx, C),
                           lambda iz: (0, iz, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    j1_spec = pl.BlockSpec((3, 1, ny, nx, C),
                           lambda iz: (0, (iz + 1) % nz, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    xi_spec = pl.BlockSpec((3, 1, ny, nx, C, 1),
                           lambda iz: (0, iz, 0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    sx_spec = pl.BlockSpec((3, nx, C), lambda iz: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((3, 1, ny, nx, C),
                          lambda iz: (0, iz, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    fj_spec = pl.BlockSpec((3, 1, ny, nx, C),
                           lambda iz: (0, (iz + 1) % nz, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    fi, fj = pl.pallas_call(
        functools.partial(_kernel_plane, ny=ny, YB=YB),
        grid=(nz,),
        in_specs=[pl.BlockSpec((1, 7), lambda iz: (0, 0),
                               memory_space=pltpu.SMEM),
                  j0_spec, j1_spec, xi_spec, sx_spec],
        out_specs=[f_spec, fj_spec],
        out_shape=[jax.ShapeDtypeStruct((3, nz, ny, nx, C), dt),
                   jax.ShapeDtypeStruct((3, nz, ny, nx, C), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(par.reshape(1, 7), gp, gp, gt, sx)
    F = fi + fj
    return jnp.transpose(F.reshape(3, nc, C), (1, 2, 0))


def main():
    N, L = 64000, 42.353
    cd = (12, 14, 14)
    C = 40
    nc = cd[0] * cd[1] * cd[2]
    rng = np.random.RandomState(0)
    occ = N // nc
    pos = np.full((nc, C, 3), float(PAD_COORD), np.float32)
    w = L / np.array(cd)
    ids = np.arange(nc)
    org = np.stack([ids % cd[0] * w[0], ids // cd[0] % cd[1] * w[1],
                    ids // (cd[0] * cd[1]) * w[2]], -1) - L / 2
    pos[:, :occ, :] = (org[:, None, :]
                       + rng.rand(nc, occ, 3).astype(np.float32) * w)
    pos = jnp.asarray(pos)
    sh = jnp.asarray(build_cell_shifts(cd, (L,) * 3)[1], jnp.float32)
    pv = jnp.asarray([6.25, 0.0163, 4.0, 4.0, 2.5], jnp.float32)
    Fr = np.asarray(cell_pair_planar_n3l(
        pos, cd, sh, pv, C=C, eval_name="lj",
        pnames=("lj1", "lj2", "rcut")))
    Fn = np.asarray(plane_n3l(pos, cd, (L, L, L), pv[:4], C=C, YB=7))
    err = np.abs(Fr - Fn).max()
    scale = np.abs(Fr).max()
    print("max |dF| =", err, " max|F| =", scale, flush=True)
    assert err < 1e-3 * max(scale, 1.0), "MISMATCH"

    def timeit(fn, label, reps=50):
        @jax.jit
        def chain(p, n):
            def body(_, p):
                return p + 1e-12 * fn(p)
            return jax.lax.fori_loop(0, n, body, p)
        o = chain(pos, 5); jax.block_until_ready(o)
        t0 = time.perf_counter()
        o = chain(pos, reps); jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{label:22s} {dt:7.3f} ms", flush=True)

    timeit(lambda p: cell_pair_planar_n3l(
        p, cd, sh, pv, C=C, eval_name="lj", pnames=("lj1", "lj2", "rcut")),
        "n3l row (current)")
    for yb in (2, 7, 14):
        timeit(lambda p, yb=yb: plane_n3l(p, cd, (L, L, L), pv[:4],
                                          C=C, YB=yb),
               f"plane n3l YB={yb}")


if __name__ == "__main__":
    main()
