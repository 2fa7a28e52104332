"""Confirm: in-kernel expand_dims (C lanes -> C sublanes) relayout cost
vs the pre-transposed xi input, force-only plane kernel."""
import sys; sys.path.insert(0, "/root/repo")
import functools, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from hoomd_tpu.ops.pallas_pair import (cell_pair_plane, build_cell_shifts,
                                       _kernel_plane)
from hoomd_tpu._config import PAD_COORD


def _kernel_noxi(lj_ref, j0_ref, jm_ref, jp_ref, sx_ref, f_ref,
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
    p0 = j0_ref[:, 0]
    pm = jm_ref[:, 0]
    pp = jp_ref[:, 0]
    szp = jnp.where(iz == nz - 1, Lz, 0.0)
    szm = jnp.where(iz == 0, -Lz, 0.0)
    sx = sx_ref[...]

    def rollx(comp, s):
        rm = jnp.concatenate([comp[:, -1:], comp[:, :-1]], axis=1)
        rp = jnp.concatenate([comp[:, 1:], comp[:, :1]], axis=1)
        if s is not None:
            rm = rm + s[0]
            rp = rp + s[2]
        return rm, comp, rp

    nchunk = ny // YB
    Fx_out, Fy_out, Fz_out = [], [], []
    for ci in range(nchunk):
        y0 = ci * YB
        xi_x = p0[0, y0:y0 + YB][:, :, :, None]   # in-kernel expand
        xi_y = p0[1, y0:y0 + YB][:, :, :, None]
        xi_z = p0[2, y0:y0 + YB][:, :, :, None]
        Px = jnp.zeros((YB, nx, C, 3 * C), jnp.float32)
        Py = jnp.zeros((YB, nx, C, 3 * C), jnp.float32)
        Pz = jnp.zeros((YB, nx, C, 3 * C), jnp.float32)
        for dz in (-1, 0, 1):
            src = pm if dz == -1 else (p0 if dz == 0 else pp)
            sz = szm if dz == -1 else (0.0 if dz == 0 else szp)
            for dy in (-1, 0, 1):
                ylo = y0 + dy

                def seg(comp_i, add_y=False):
                    c = src[comp_i]
                    lo, hi = ylo, ylo + YB
                    if lo >= 0 and hi <= ny:
                        return c[lo:hi]
                    if lo < 0:
                        a = c[ny + lo:]
                        if add_y:
                            a = a - Ly
                        return jnp.concatenate([a, c[:hi]], axis=0)
                    b = c[:hi - ny]
                    if add_y:
                        b = b + Ly
                    return jnp.concatenate([c[lo:], b], axis=0)
                jx_b = seg(0)
                jy_b = seg(1, add_y=True)
                jz_b = seg(2)
                if dz != 0:
                    jz_b = jz_b + sz
                xm, x0c, xp = rollx(jx_b, sx)
                jxw = jnp.concatenate([xm, x0c, xp], axis=-1)
                ym, yc, yp = rollx(jy_b, None)
                jyw = jnp.concatenate([ym, yc, yp], axis=-1)
                zm, zc, zp = rollx(jz_b, None)
                jzw = jnp.concatenate([zm, zc, zp], axis=-1)
                drx = xi_x - jxw[:, :, None, :]
                dry = xi_y - jyw[:, :, None, :]
                drz = xi_z - jzw[:, :, None, :]
                r2 = drx * drx + dry * dry + drz * drz
                r2s = jnp.maximum(r2, 1e-3)
                cut = r2 < rc2
                r2i = pl.reciprocal(r2s, approx=True)
                r6i = r2i * r2i * r2i
                fdivr = jnp.where(
                    cut, r2i * r6i * (12.0 * lj1 * r6i - 6.0 * lj2),
                    0.0)
                Px = Px + fdivr * drx
                Py = Py + fdivr * dry
                Pz = Pz + fdivr * drz
        Fx_out.append(jnp.sum(Px, axis=-1))
        Fy_out.append(jnp.sum(Py, axis=-1))
        Fz_out.append(jnp.sum(Pz, axis=-1))
    F = jnp.stack([jnp.concatenate(Fx_out, axis=0),
                   jnp.concatenate(Fy_out, axis=0),
                   jnp.concatenate(Fz_out, axis=0)])
    f_ref[:, 0] = F


@functools.partial(jax.jit, static_argnames=('cell_dim', 'C'))
def plane_noxi(cell_pos, cell_dim, box_L, lj_params, *, C):
    nx, ny, nz = cell_dim
    nc = nx * ny * nz
    dt = cell_pos.dtype
    g = cell_pos.reshape(nz, ny, nx, C, 3)
    gp = jnp.transpose(g, (4, 0, 1, 2, 3))
    Lx, Ly, Lz = box_L
    ar = jnp.arange(nx)
    sx = jnp.stack([jnp.where(ar == 0, -Lx, 0.0),
                    jnp.zeros((nx,), dt),
                    jnp.where(ar == nx - 1, Lx, 0.0)])
    sx = jnp.broadcast_to(sx[:, :, None], (3, nx, C))
    par = jnp.concatenate([lj_params, jnp.asarray([Lx, Ly, Lz], dt)])

    def pspec(dz):
        return pl.BlockSpec((3, 1, ny, nx, C),
                            lambda iz, dz=dz: (0, (iz + dz) % nz, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(_kernel_noxi, ny=ny, YB=7),
        grid=(nz,),
        in_specs=[pl.BlockSpec((1, 7), lambda iz: (0, 0),
                               memory_space=pltpu.SMEM),
                  pspec(0), pspec(-1), pspec(1),
                  pl.BlockSpec((3, nx, C), lambda iz: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, 1, ny, nx, C),
                               lambda iz: (0, iz, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, nz, ny, nx, C), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(par.reshape(1, 7), gp, gp, gp, sx)
    return jnp.transpose(f.reshape(3, nc, C), (1, 2, 0))


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
    pv4 = jnp.asarray([6.25, 0.0163, 4.0, 4.0], jnp.float32)

    def run_variant(fn, label, reps=50):
        @jax.jit
        def chain(p, n):
            def body(_, p):
                return p + 1e-12 * fn(p)
            return jax.lax.fori_loop(0, n, body, p)
        o = chain(pos, 2); jax.block_until_ready(o)
        t0 = time.perf_counter()
        o = chain(pos, reps); jax.block_until_ready(o)
        dtm = (time.perf_counter() - t0) / reps * 1e3
        print(f"{label:28s} {dtm:7.3f} ms", flush=True)

    run_variant(lambda p: cell_pair_plane(
        p, cd, sh, pv4, C=C, eval_name='lj', pnames=('lj1', 'lj2'),
        recip='approx'), "plane gt-input (prod)")
    run_variant(lambda p: plane_noxi(p, cd, (L, L, L), pv4, C=C),
                "plane in-kernel expand")


if __name__ == "__main__":
    main()
