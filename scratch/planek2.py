"""Experiment 2: full-stencil plane kernel with DEFERRED reductions.

Hypothesis: per-offset lane/sublane reductions (lowered as shift-reduce
chains over full tiles) dominate the row kernel's time.  This variant
accumulates fdivr*dr into (YB, nx, C, 3C) window-frame accumulators
across all 9 (dz, dy) offsets and lane-reduces ONCE per chunk; Newton
j-side sums are dropped entirely (full stencil, every pair evaluated
from both sides — 9/5 more pair evals but zero per-offset reductions).
"""
import sys; sys.path.insert(0, "/root/repo")
import functools
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from hoomd_tpu.ops.pallas_pair import (cell_pair_planar_n3l,
                                       cell_pair_planar,
                                       build_cell_shifts)
from hoomd_tpu._config import PAD_COORD


def _kernel_plane9(lj_ref, j0_ref, jm_ref, jp_ref, xi_ref, sx_ref, f_ref,
                   *, ny, YB, recip='div'):
    C = j0_ref.shape[-1]
    rc2 = lj_ref[0, 0]
    lj1 = lj_ref[0, 2]
    lj2 = lj_ref[0, 3]
    Ly = lj_ref[0, 5]
    Lz = lj_ref[0, 6]
    iz = pl.program_id(0)
    nz = pl.num_programs(0)
    nx = j0_ref.shape[-2]

    p0 = j0_ref[:, 0]            # (3, ny, nx, C) plane z
    pm = jm_ref[:, 0]            # plane z-1
    pp = jp_ref[:, 0]            # plane z+1
    szp = jnp.where(iz == nz - 1, Lz, 0.0)
    szm = jnp.where(iz == 0, -Lz, 0.0)
    xi = xi_ref[:, 0]            # (3, ny, nx, C, 1)
    sx = sx_ref[...]             # (3, nx, C)

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
        xi_x = xi[0, y0:y0 + YB]
        xi_y = xi[1, y0:y0 + YB]
        xi_z = xi[2, y0:y0 + YB]
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
                if recip == 'div':
                    r2i = 1.0 / r2s
                elif recip == 'approx':
                    r2i = pl.reciprocal(r2s, approx=True)
                else:
                    y = pl.reciprocal(r2s, approx=True)
                    r2i = y * (2.0 - r2s * y)
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


@functools.partial(jax.jit, static_argnames=('cell_dim', 'C', 'YB', 'recip'))
def plane9(cell_pos, cell_dim, box_L, lj_params, *, C, YB, recip='div'):
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

    def pspec(dz):
        return pl.BlockSpec((3, 1, ny, nx, C),
                            lambda iz, dz=dz: (0, (iz + dz) % nz, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    xi_spec = pl.BlockSpec((3, 1, ny, nx, C, 1),
                           lambda iz: (0, iz, 0, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    sx_spec = pl.BlockSpec((3, nx, C), lambda iz: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((3, 1, ny, nx, C),
                          lambda iz: (0, iz, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(_kernel_plane9, ny=ny, YB=YB, recip=recip),
        grid=(nz,),
        in_specs=[pl.BlockSpec((1, 7), lambda iz: (0, 0),
                               memory_space=pltpu.SMEM),
                  pspec(0), pspec(-1), pspec(1), xi_spec, sx_spec],
        out_specs=f_spec,
        out_shape=jax.ShapeDtypeStruct((3, nz, ny, nx, C), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=110 * 1024 * 1024),
    )(par.reshape(1, 7), gp, gp, gp, gt, sx)
    return jnp.transpose(f.reshape(3, nc, C), (1, 2, 0))


def make_config(N, L, cd, C, seed=0):
    """Jittered-lattice config: no overlapping pairs."""
    rng = np.random.RandomState(seed)
    n = int(round(N ** (1 / 3)))
    assert n * n * n == N
    a = L / n
    ax = np.arange(n) * a - L / 2 + a / 2
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing='ij')
    pos = np.stack([X.ravel(), Y.ravel(), Z.ravel()], -1)
    pos += rng.uniform(-0.3 * a, 0.3 * a, pos.shape)
    pos = pos.astype(np.float32)
    # bin into cells
    nc = cd[0] * cd[1] * cd[2]
    w = L / np.array(cd)
    c3 = np.clip(((pos + L / 2) / w).astype(int), 0, np.array(cd) - 1)
    cid = c3[:, 0] + cd[0] * (c3[:, 1] + cd[1] * c3[:, 2])
    order = np.argsort(cid, kind='stable')
    cell_pos = np.full((nc, C, 3), float(PAD_COORD), np.float32)
    counts = np.zeros(nc, int)
    for i in order:
        c = cid[i]
        assert counts[c] < C, f"cell overflow {counts[c]}"
        cell_pos[c, counts[c]] = pos[i]
        counts[c] += 1
    print("occupancy max", counts.max(), "mean", counts.mean())
    return jnp.asarray(cell_pos)


def main():
    N, L = 64000, 42.353
    cd = (12, 14, 14)
    C = 40
    pos = make_config(N, L, cd, C)
    sh = jnp.asarray(build_cell_shifts(cd, (L,) * 3)[1], jnp.float32)
    pv = jnp.asarray([6.25, 0.0163, 4.0, 4.0, 2.5], jnp.float32)

    results = {}

    def run_variant(fn, label, reps=50):
        @jax.jit
        def chain(p, n):
            def body(_, p):
                return p + 1e-12 * fn(p)
            return jax.lax.fori_loop(0, n, body, p)
        F1 = chain(pos, 1); jax.block_until_ready(F1)
        t0 = time.perf_counter()
        o = chain(pos, reps); jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / reps * 1e3
        results[label] = np.asarray((F1 - pos) * 1e12)
        print(f"{label:26s} {dt:7.3f} ms", flush=True)

    run_variant(lambda p: cell_pair_planar_n3l(
        p, cd, sh, pv, C=C, eval_name="lj",
        pnames=("lj1", "lj2", "rcut")), "n3l row (current)")
    for rc_ in ('div', 'approx', 'newton'):
        run_variant(lambda p, rc_=rc_: plane9(p, cd, (L, L, L), pv[:4],
                                              C=C, YB=7, recip=rc_),
                    f"plane9 YB=7 recip={rc_}")
    ref = results["n3l row (current)"]
    scale = np.abs(ref).max()
    for k, v in results.items():
        print(f"{k:26s} max|dF| vs n3l = {np.abs(v - ref).max():.3e}"
              f"  rel {np.abs(v - ref).max() / scale:.2e}", flush=True)


if __name__ == "__main__":
    main()
