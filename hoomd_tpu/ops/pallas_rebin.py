"""Plane-local cell re-binning as a Pallas stencil op.

Between neighbor rebuilds every particle moves less than half the
Verlet skin (enforced by the engine's danger check), which is far less
than one cell width — so re-binning never moves a particle more than
one cell along any axis.  The reference rebuilds its cell list with a
global counting sort every time (hoomd/CellList.cc computeCellList);
the fast engine's general path uses a multi-operand lax.sort
(ops/fast_lj._rebin).  Both are O(M log M)-ish global data movements.
This op exploits the one-cell bound instead: three sequential axis
sweeps (x, y, z), each a 3-point stencil:

  1. emigrants: slots whose position left the cell's [o, o+w) interval
     along the axis are compacted into per-direction buffers of E slots
     (rank via a strictly-lower-triangular ones matmul — no cumsum, no
     sort, MXU-friendly),
  2. their slots are cleared to the canonical PAD fill,
  3. each cell pulls the neighbors' emigrant buffers (a roll, exactly
     the force kernel's stencil move) and places them into its free
     slots by matching immigrant rank to free-slot rank with a one-hot
     select — every value lands via multiply-by-one, so the payload is
     bit-exact.

Positions are stored unwrapped within the box; a migration across the
periodic boundary shifts the position by ±L and counts the image flip,
matching box.wrap (box.py wrap).  Slot order inside a cell comes out
scrambled relative to the sort path — the stencil force kernels are
insensitive to slot order, so this is free.

Payload: 14 columns (pos xyz, vel xyz, force xyz, image xyz, tag,
mass), all carried as f32 planes; integer columns are converted by
VALUE (exact below 2^24 — checked by the wrapper).

Overflow (more than E emigrants per direction per cell, or more
immigrants than free slots) raises a sticky flag; the caller falls
back to the sort rebuild, exactly like the cell-capacity grow/retry
protocol.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .._config import PAD_COORD

# column indices
PX, PY, PZ, VX, VY, VZ, FX, FY, FZ, IX, IY, IZ, TG, MS = range(14)
NCOL = 14

_FILLS = np.zeros((NCOL,), np.float32)
_FILLS[PX] = _FILLS[PY] = _FILLS[PZ] = PAD_COORD
_FILLS[TG] = -1.0
_FILLS[MS] = 1.0


def _rank_f32(mask_f, tri):
    """Exclusive running count of set entries along the last axis.

    mask_f: (..., n) 0/1 float; tri: (n, n) strictly-lower-triangular
    ones.  rank[c] = #set entries before c.  A matmul instead of a
    cumsum: Mosaic lowers it to the MXU and the result is exact for
    counts < 2^24."""
    return jax.lax.dot_general(
        mask_f, tri, (((mask_f.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _tri(n):
    """Strictly-upper-triangular ones (i < j), built from iota so it
    can be materialized inside a Pallas kernel (captured numpy
    constants are rejected by pallas_call)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r < c).astype(jnp.float32)


def _compact(cols, mask, E, tri):
    """Pull masked slots of (..., C) rows into (..., E) buffers.

    cols (NCOL, ..., C); mask (..., C) bool.  Returns (em (NCOL, ...,
    E), em_valid (..., E), ovf scalar bool).  Slots ranked past E are
    dropped and flagged."""
    C = mask.shape[-1]
    mf = mask.astype(jnp.float32)
    rank = _rank_f32(mf, tri)                       # (..., C)
    # one-hot in (…, E, C) layout: C stays the (well-padded) lane dim;
    # an (…, C, E) layout would pad E=8 lanes to 128 (16x VMEM and the
    # dominant register-spill source).  f32-mask algebra throughout —
    # Mosaic cannot insert dims on sub-32-bit (bool) vectors.
    eio = jax.lax.broadcasted_iota(jnp.int32, mask.shape[:-1] + (E, C),
                                   mask.ndim - 1).astype(jnp.float32)
    oh = mf[..., None, :] * (rank[..., None, :] == eio).astype(
        jnp.float32)                                # (..., E, C)
    # one broadcast product over all columns: fewer, larger ops keep
    # the Mosaic scheduler tractable in the unrolled kernel (a
    # per-column Python loop blew compile time past 10 minutes)
    em = jnp.sum(cols[..., None, :] * oh[None], axis=-1)  # (NCOL,...,E)
    cnt = jnp.sum(mf, axis=-1)                          # (...,)
    evio = jax.lax.broadcasted_iota(jnp.int32, mask.shape[:-1] + (E,),
                                    mask.ndim - 1).astype(jnp.float32)
    # validity as 0/1 f32: bool vectors cannot be rolled/concatenated
    # by Mosaic (invalid register cast), and downstream wants f32 math
    em_valid = (evio < cnt[..., None]).astype(jnp.float32)
    ovf = jnp.any(cnt > E)
    return em, em_valid, ovf


def _place(cols, free, imm, imm_valid, tri_k):
    """Insert immigrant entries into free slots.

    cols (NCOL, ..., C); free (..., C) bool; imm (NCOL, ..., K);
    imm_valid (..., K) 0/1 f32.  Immigrant of rank r lands in the free
    slot of rank r — a one-hot select, so values transfer exactly."""
    ff = free.astype(jnp.float32)
    iv = imm_valid
    frank = _rank_f32(ff, tri_k['C'])               # (..., C)
    irank = _rank_f32(iv, tri_k['K'])               # (..., K)
    # f32-mask algebra (no bool minor-dim insertion — see _compact)
    sf = (iv[..., :, None] * ff[..., None, :]
          * (irank[..., :, None]
             == frank[..., None, :]).astype(jnp.float32))  # (..., K, C)
    add = jnp.sum(imm[..., :, None] * sf[None], axis=-2)  # (NCOL,...,C)
    got = jnp.sum(sf, axis=-2) > 0.0                       # (..., C)
    out = jnp.where(got[None], add, cols)
    ovf = jnp.any(jnp.sum(iv, -1) > jnp.sum(ff, -1))
    return out, ovf


def _set_col(arr, col, val):
    """arr with arr[col] replaced by val — via iota+select, because
    Mosaic has no scatter lowering for .at[i].set on a leading axis."""
    ci = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
    return jnp.where(ci == col, val[None], arr)


def _add_col(arr, col, delta):
    ci = jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0)
    return jnp.where(ci == col, arr + delta, arr)


def _clear(cols, stay):
    """Reset non-staying slots to the canonical PAD fill.  The fill is
    built at full shape from a column-index iota: reshaping a (NCOL,)
    lane vector up to (NCOL, 1, 1, 1) is an unsupported Mosaic shape
    cast."""
    ci = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 0)
    fill = jnp.where(ci <= PZ, jnp.float32(PAD_COORD), 0.0)
    fill = jnp.where(ci == TG, -1.0, fill)
    fill = jnp.where(ci == MS, 1.0, fill)
    return jnp.where(stay[None], cols, fill)


def _shift_boundary(em, axis_in_plane, n, at_index, dpos_col, dimg_col,
                    L):
    """Apply the periodic shift to rolled emigrant buffers arriving at
    the boundary cell: pos ±L, img ∓(±1).  em (NCOL, ny, nx, E);
    axis_in_plane 0 (y) or 1 (x); at_index 0 or n-1."""
    io = jax.lax.broadcasted_iota(jnp.int32, em.shape[1:],
                                  axis_in_plane)
    hit = (io == at_index)
    sgn = -1.0 if at_index == 0 else 1.0
    # arriving at 0 from n-1 (moved +): pos -= L, img += 1
    # arriving at n-1 from 0 (moved -): pos += L, img -= 1
    em = _set_col(em, dpos_col,
                  jnp.where(hit, em[dpos_col] + sgn * L, em[dpos_col]))
    em = _set_col(em, dimg_col,
                  jnp.where(hit, em[dimg_col] - sgn, em[dimg_col]))
    return em


def _rebin_plane_axis(cols, *, axis_in_plane, pos_col, img_col, n, w, L,
                      E, tris):
    """One in-plane axis sweep over cols (NCOL, ny, nx, C).

    axis_in_plane: 0 sweeps y (dim 1 of the plane), 1 sweeps x (dim 2).
    Returns (cols', ovf)."""
    arr_axis = 1 + axis_in_plane                 # axis inside (NCOL,...)
    io = jax.lax.broadcasted_iota(jnp.int32, cols.shape[1:],
                                  axis_in_plane).astype(jnp.float32)
    origin = io * w - 0.5 * L
    local = cols[pos_col] - origin
    valid = cols[TG] >= 0.0
    migp = valid & (local >= w)
    migm = valid & (local < 0.0)
    em_p, vp, o1 = _compact(cols, migp, E, tris['C'])
    em_m, vm, o2 = _compact(cols, migm, E, tris['C'])
    stay = valid & ~(migp | migm)
    cols = _clear(cols, stay)

    em_p = jnp.roll(em_p, 1, axis=arr_axis)
    vp = jnp.roll(vp, 1, axis=arr_axis - 1)
    em_p = _shift_boundary(em_p, axis_in_plane, n, 0, pos_col, img_col,
                           L)
    em_m = jnp.roll(em_m, -1, axis=arr_axis)
    vm = jnp.roll(vm, -1, axis=arr_axis - 1)
    em_m = _shift_boundary(em_m, axis_in_plane, n, n - 1, pos_col,
                           img_col, L)

    imm = jnp.concatenate([em_p, em_m], axis=-1)       # (NCOL,...,2E)
    imm_valid = jnp.concatenate([vp, vm], axis=-1)
    cols, o3 = _place(cols, ~stay, imm, imm_valid,
                      {'C': tris['C'], 'K': tris['K']})
    return cols, (o1 | o2 | o3)


def _kernel_rebin(par_ref, c_ref, o_ref, st_ref, emz_scr, *, nz, ny, nx,
                  C, E, interpret):
    """Standalone rebin kernel.  c_ref/o_ref (NCOL, nz, ny, nx, C);
    emz_scr (2, nz, ny, nx, NCOL*E) z-emigrant buffers (dir 0 = +z,
    dir 1 = -z); st_ref (8, 128) stats [ovf]."""
    from jax.experimental import pallas as pl

    Lx = par_ref[0, 0]
    Ly = par_ref[0, 1]
    Lz = par_ref[0, 2]
    wx = par_ref[0, 3]
    wy = par_ref[0, 4]
    wz = par_ref[0, 5]
    tris = {'C': _tri(C), 'K': _tri(2 * E)}

    def plane(iz):
        return o_ref[:, pl.ds(iz, 1)][:, 0]          # (NCOL, ny, nx, C)

    def store(iz, cols):
        o_ref[:, pl.ds(iz, 1)] = cols[:, None]

    def sweep1(iz, ovf):
        """x pass + y pass + z-emigrant collection, one plane visit
        (reads the input ref, writes the output ref once — fusing the
        initial copy and the separate z-collect sweep saves two full
        read+write passes over the state)."""
        cols = c_ref[:, pl.ds(iz, 1)][:, 0]
        cols, o1 = _rebin_plane_axis(
            cols, axis_in_plane=1, pos_col=PX, img_col=IX, n=nx, w=wx,
            L=Lx, E=E, tris=tris)
        cols, o2 = _rebin_plane_axis(
            cols, axis_in_plane=0, pos_col=PY, img_col=IY, n=ny, w=wy,
            L=Ly, E=E, tris=tris)
        origin = jnp.float32(iz) * wz - 0.5 * Lz
        local = cols[PZ] - origin
        valid = cols[TG] >= 0.0
        migp = valid & (local >= wz)
        migm = valid & (local < 0.0)
        em_p, vp, o3 = _compact(cols, migp, E, tris['C'])
        em_m, vm, o4 = _compact(cols, migm, E, tris['C'])
        stay = valid & ~(migp | migm)
        store(iz, _clear(cols, stay))
        # encode validity in the tag column: invalid entries get -1
        em_p = _set_col(em_p, TG, jnp.where(vp > 0.0, em_p[TG], -1.0))
        em_m = _set_col(em_m, TG, jnp.where(vm > 0.0, em_m[TG], -1.0))
        # per-column static lane-slice stores into the packed
        # (..., NCOL*E) scratch: no cross-lane concat shuffles, no
        # 8->128 lane padding of an E-minor scratch
        for c in range(NCOL):
            emz_scr[0, pl.ds(iz, 1), :, :, c * E:(c + 1) * E] = \
                em_p[c][None]
            emz_scr[1, pl.ds(iz, 1), :, :, c * E:(c + 1) * E] = \
                em_m[c][None]
        return ovf | o1 | o2 | o3 | o4

    def z_place(iz, ovf):
        cols = plane(iz)
        izm = (iz - 1) % nz
        izp = (iz + 1) % nz
        pk_p = emz_scr[0, pl.ds(izm, 1)][0]          # from below, moved +
        pk_m = emz_scr[1, pl.ds(izp, 1)][0]          # from above, moved -
        em_p = jnp.stack([pk_p[..., c * E:(c + 1) * E]
                          for c in range(NCOL)])
        em_m = jnp.stack([pk_m[..., c * E:(c + 1) * E]
                          for c in range(NCOL)])
        # periodic boundary: arriving at plane 0 from nz-1 (+ move):
        # pos -= Lz, img += 1; at plane nz-1 from 0 (- move): reverse.
        # (jnp.where forms work for both static and traced iz)
        sp = jnp.where(jnp.asarray(iz) == 0, 1.0, 0.0)
        em_p = _add_col(em_p, PZ, -sp * Lz)
        em_p = _add_col(em_p, IZ, sp)
        sm = jnp.where(jnp.asarray(iz) == nz - 1, 1.0, 0.0)
        em_m = _add_col(em_m, PZ, sm * Lz)
        em_m = _add_col(em_m, IZ, -sm)
        imm = jnp.concatenate([em_p, em_m], axis=-1)
        imm_valid = jnp.concatenate(
            [(em_p[TG] >= 0.0).astype(jnp.float32),
             (em_m[TG] >= 0.0).astype(jnp.float32)], axis=-1)
        free = cols[TG] < 0.0
        cols, o1 = _place(cols, free, imm, imm_valid,
                          {'C': tris['C'], 'K': tris['K']})
        store(iz, cols)
        return ovf | o1

    # Rolled z sweeps.  An unrolled variant (static plane indices) was
    # tried to remove the per-visit dynamic-slice cost, but the 28
    # unrolled read-modify-write plane bodies push Mosaic's compiler
    # into a >80-minute compile — a compile bomb, not a speedup.  Keep
    # the rolled loops until the kernel is restructured (e.g. fused
    # into the megastep kernel with leaner bodies).
    ovf = jax.lax.fori_loop(0, nz, sweep1, jnp.asarray(False),
                            unroll=False)
    ovf = jax.lax.fori_loop(0, nz, z_place, ovf, unroll=False)
    z = jnp.zeros((128,), jnp.float32)
    st_ref[...] = jnp.stack([z + jnp.where(ovf, 1.0, 0.0),
                             z, z, z, z, z, z, z])


def _select_axis(cand, local, w, C, tri3):
    """One-shot re-selection: each cell pulls its new occupants out of
    the 3C-wide candidate window (own slots + both axis neighbors'
    slots, positions pre-shifted at the periodic boundary).

    cand (NCOL, ny, nx, 3C); local (ny, nx, 3C) = candidate position
    minus the cell's axis origin.  A candidate belongs to the cell iff
    0 <= local < w; compaction rank comes from the strictly-lower
    triangular ones matmul (MXU); the one-hot select keeps 3C in the
    lane dimension (120 of 128 lanes at C=40 — the (…, E, C) layouts of
    the compact/place formulation pad C=40 lanes to 128 and measure ~6x
    slower end-to-end).  Returns (cols' (NCOL, ny, nx, C), ovf)."""
    sf = ((cand[TG] >= 0.0) & (local >= 0.0)
          & (local < w)).astype(jnp.float32)        # (ny, nx, 3C)
    rank = _rank_f32(sf, tri3)                      # (ny, nx, 3C)
    K3 = cand.shape[-1]
    sio = jax.lax.broadcasted_iota(
        jnp.int32, sf.shape[:-1] + (C, K3), sf.ndim - 1)
    oh = sf[..., None, :] * (rank[..., None, :]
                             == sio.astype(jnp.float32)).astype(
                                 jnp.float32)       # (ny, nx, C, 3C)
    # per-column product+lane-reduce (a (NCOL, ny, nx, C, 3C) tensor
    # would be ~45 MB; the static column loop keeps each intermediate
    # one (ny, nx, C, 3C) tile chain)
    outs = [jnp.sum(cand[c][..., None, :] * oh, axis=-1)
            for c in range(NCOL)]
    out = jnp.stack(outs)                           # (NCOL, ny, nx, C)
    got = jnp.sum(oh, axis=-1)                      # (ny, nx, C)
    ci = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
    fill = jnp.where(ci <= PZ, jnp.float32(PAD_COORD), 0.0)
    fill = jnp.where(ci == TG, -1.0, fill)
    fill = jnp.where(ci == MS, 1.0, fill)
    out = out + (1.0 - got)[None] * fill
    ovf = jnp.any(sf * rank >= C)
    return out, ovf


def _window3(cols, axis_in_plane, n, L, pos_col, img_col):
    """3-cell candidate window along an in-plane axis: own slots plus
    both neighbors' (rolled, boundary-shifted).  cols (NCOL, ny, nx, C)
    -> (NCOL, ny, nx, 3C)."""
    arr_axis = 1 + axis_in_plane
    cp = jnp.roll(cols, 1, axis=arr_axis)           # from index-1
    cp = _shift_boundary(cp, axis_in_plane, n, 0, pos_col, img_col, L)
    cm = jnp.roll(cols, -1, axis=arr_axis)          # from index+1
    cm = _shift_boundary(cm, axis_in_plane, n, n - 1, pos_col, img_col,
                         L)
    return jnp.concatenate([cp, cols, cm], axis=-1)


def _kernel_rebin_select(par_ref, c0_ref, c1_ref, c2_ref, o_ref, st_ref,
                         *, nz, ny, nx, C):
    """Grid-over-z one-pass rebin: z-select from the 3-plane window,
    then x- and y-selects in-plane.  c0/c1/c2 blocks are planes
    (iz-1)%nz, iz, (iz+1)%nz of the raw state (BlockSpec index maps);
    o block is plane iz; st (8, 128) is the revisited ovf accumulator."""
    from jax.experimental import pallas as pl

    iz = pl.program_id(0)
    Lx = par_ref[0, 0]
    Ly = par_ref[0, 1]
    Lz = par_ref[0, 2]
    wx = par_ref[0, 3]
    wy = par_ref[0, 4]
    wz = par_ref[0, 5]
    tri3 = _tri(3 * C)

    # ---- z window: planes iz-1, iz, iz+1 with periodic shifts at the
    # boundary planes (scalar-conditional: only iz==0 receives from
    # nz-1 across the boundary, only iz==nz-1 from 0)
    cb = c0_ref[:, 0]
    sp = jnp.where(iz == 0, 1.0, 0.0)
    cb = _add_col(cb, PZ, -sp * Lz)
    cb = _add_col(cb, IZ, sp)
    ca = c2_ref[:, 0]
    sm = jnp.where(iz == nz - 1, 1.0, 0.0)
    ca = _add_col(ca, PZ, sm * Lz)
    ca = _add_col(ca, IZ, -sm)
    cand = jnp.concatenate([cb, c1_ref[:, 0], ca], axis=-1)
    origin_z = iz.astype(jnp.float32) * wz - 0.5 * Lz
    cols, o1 = _select_axis(cand, cand[PZ] - origin_z, wz, C, tri3)

    # ---- x then y, in-plane
    iox = jax.lax.broadcasted_iota(jnp.int32, (ny, nx, 3 * C),
                                   1).astype(jnp.float32)
    cand = _window3(cols, 1, nx, Lx, PX, IX)
    cols, o2 = _select_axis(cand, cand[PX] - (iox * wx - 0.5 * Lx), wx,
                            C, tri3)
    ioy = jax.lax.broadcasted_iota(jnp.int32, (ny, nx, 3 * C),
                                   0).astype(jnp.float32)
    cand = _window3(cols, 0, ny, Ly, PY, IY)
    cols, o3 = _select_axis(cand, cand[PY] - (ioy * wy - 0.5 * Ly), wy,
                            C, tri3)

    o_ref[:, 0] = cols
    ovf = (o1 | o2 | o3).astype(jnp.float32)
    prev = jnp.where(iz == 0, 0.0, st_ref[0, 0])
    st_ref[...] = jnp.full((8, 128), jnp.maximum(prev, ovf),
                           jnp.float32)


def _kernel_rebin_sweep(par_ref, c_ref, o_ref, emz_ref, st_ref, *, nz,
                        ny, nx, C, E):
    """Grid-over-z sweep pass: x pass + y pass + z-emigrant collection
    for ONE plane per grid step (static block indexing — the in-kernel
    fori_loop variant pays ~0.1 ms of dynamic-slice machinery per plane
    visit, ~2.5 ms/call at production grids; the grid form pipelines).
    c/o blocks (NCOL, 1, ny, nx, C); emz block (2, 1, ny, nx, NCOL*E);
    st (8, 128) revisited by every step (ovf accumulator)."""
    from jax.experimental import pallas as pl

    iz = pl.program_id(0)
    Lx = par_ref[0, 0]
    Ly = par_ref[0, 1]
    Lz = par_ref[0, 2]
    wx = par_ref[0, 3]
    wy = par_ref[0, 4]
    wz = par_ref[0, 5]
    tris = {'C': _tri(C), 'K': _tri(2 * E)}

    cols = c_ref[:, 0]                              # (NCOL, ny, nx, C)
    cols, o1 = _rebin_plane_axis(
        cols, axis_in_plane=1, pos_col=PX, img_col=IX, n=nx, w=wx,
        L=Lx, E=E, tris=tris)
    cols, o2 = _rebin_plane_axis(
        cols, axis_in_plane=0, pos_col=PY, img_col=IY, n=ny, w=wy,
        L=Ly, E=E, tris=tris)
    origin = iz.astype(jnp.float32) * wz - 0.5 * Lz
    local = cols[PZ] - origin
    valid = cols[TG] >= 0.0
    migp = valid & (local >= wz)
    migm = valid & (local < 0.0)
    em_p, vp, o3 = _compact(cols, migp, E, tris['C'])
    em_m, vm, o4 = _compact(cols, migm, E, tris['C'])
    stay = valid & ~(migp | migm)
    o_ref[:, 0] = _clear(cols, stay)
    em_p = _set_col(em_p, TG, jnp.where(vp > 0.0, em_p[TG], -1.0))
    em_m = _set_col(em_m, TG, jnp.where(vm > 0.0, em_m[TG], -1.0))
    for c in range(NCOL):
        emz_ref[0, 0, :, :, c * E:(c + 1) * E] = em_p[c]
        emz_ref[1, 0, :, :, c * E:(c + 1) * E] = em_m[c]
    ovf = (o1 | o2 | o3 | o4).astype(jnp.float32)
    prev = jnp.where(iz == 0, 0.0, st_ref[0, 0])
    st_ref[...] = jnp.full((8, 128), jnp.maximum(prev, ovf),
                           jnp.float32)


def _kernel_rebin_place(par_ref, c_ref, emp_ref, emm_ref, o_ref, st_ref,
                        *, nz, ny, nx, C, E):
    """Grid-over-z place pass: insert the z immigrants of plane iz
    (emigrant buffers of planes iz∓1, selected by the BlockSpec index
    maps — no in-kernel dynamic slicing) into its free slots."""
    from jax.experimental import pallas as pl

    iz = pl.program_id(0)
    Lz = par_ref[0, 2]
    tris = {'C': _tri(C), 'K': _tri(2 * E)}
    cols = c_ref[:, 0]
    pk_p = emp_ref[0, 0]                            # (ny, nx, NCOL*E)
    pk_m = emm_ref[0, 0]
    em_p = jnp.stack([pk_p[..., c * E:(c + 1) * E] for c in range(NCOL)])
    em_m = jnp.stack([pk_m[..., c * E:(c + 1) * E] for c in range(NCOL)])
    sp = jnp.where(iz == 0, 1.0, 0.0)
    em_p = _add_col(em_p, PZ, -sp * Lz)
    em_p = _add_col(em_p, IZ, sp)
    sm = jnp.where(iz == nz - 1, 1.0, 0.0)
    em_m = _add_col(em_m, PZ, sm * Lz)
    em_m = _add_col(em_m, IZ, -sm)
    imm = jnp.concatenate([em_p, em_m], axis=-1)
    imm_valid = jnp.concatenate(
        [(em_p[TG] >= 0.0).astype(jnp.float32),
         (em_m[TG] >= 0.0).astype(jnp.float32)], axis=-1)
    free = cols[TG] < 0.0
    cols, o1 = _place(cols, free, imm, imm_valid,
                      {'C': tris['C'], 'K': tris['K']})
    o_ref[:, 0] = cols
    ovf = o1.astype(jnp.float32)
    prev = jnp.where(iz == 0, 0.0, st_ref[0, 0])
    st_ref[...] = jnp.full((8, 128), jnp.maximum(prev, ovf),
                           jnp.float32)


@functools.partial(jax.jit, static_argnames=('cell_dim', 'C'))
def _xsel_stages(cols, cell_dim, L, half, C, n_live0):
    """The three staged axis selects shared by the (nc, C)-layout and
    plane-layout xsel entry points.  cols (nz, ny, nx, C, 14) channel
    matrix: pos3 vel3 frc3 img3 tag mass.  Returns (cols', cap_ovf,
    lost)."""
    nx, ny, nz = cell_dim
    dtp = cols.dtype
    CT = 12                                # tag channel
    fill = jnp.zeros((14,), dtp)
    fill = fill.at[0].set(PAD_COORD).at[1].set(PAD_COORD) \
        .at[2].set(PAD_COORD).at[CT].set(-1.0).at[13].set(1.0)
    cap_ovf = jnp.zeros((), bool)
    # transient mid-stage capacity: C + 8 covers equilibrated liquids
    # with the same tail margin as C itself; the rare melt-transient
    # overflow maps to the sort-retry protocol (cap_ovf), not to a
    # capacity change, so sizing this tight only costs a retried
    # segment, while the placement tensor P — the dominant HBM traffic
    # of the rebin — shrinks by (C+16)/(C+8)
    Cmid = C + 8

    for arr_axis, n_ax, p_ch, out_cap in (
            (2, nx, 0, Cmid), (1, ny, 1, Cmid), (0, nz, 2, C)):
        lanes = 3 * cols.shape[3]
        win = jnp.concatenate(
            [jnp.roll(cols, 1, axis=arr_axis), cols,
             jnp.roll(cols, -1, axis=arr_axis)], axis=3)
        io = jax.lax.broadcasted_iota(
            jnp.int32, win.shape[:3], arr_axis).astype(dtp)[..., None]
        # candidate's target bin along this axis, from its position:
        # the same global floor from every viewing cell — no seam
        # arithmetic, no double-claim boundary risk
        tband = jnp.clip(jnp.floor((win[..., p_ch] + half[p_ch])
                                   / L[p_ch] * n_ax), 0, n_ax - 1)
        claim = (win[..., CT] >= 0.0) & (tband == io)
        cf = claim.astype(dtp)
        rank = jnp.cumsum(cf, axis=-1) - cf           # exclusive
        nclaim = jnp.sum(cf, axis=-1)                 # per-cell count
        cap_ovf = cap_ovf | (jnp.max(nclaim) > out_cap)
        sio = jax.lax.broadcasted_iota(
            jnp.int32, win.shape[:3] + (out_cap, lanes), 3).astype(dtp)
        P = cf[..., None, :] * (rank[..., None, :] == sio).astype(dtp)
        # precision HIGH (bf16x3) is REQUIRED for exactness on the MXU:
        # the default single-pass bf16 truncates the f32 payload (tags
        # above 2^8 round; positions quantize to 8 mantissa bits —
        # observed as catastrophic carry corruption on TPU, invisible
        # on CPU which ignores precision).  bf16x3 splits each f32
        # exactly into three bf16 terms, so one-hot x value sums
        # reproduce the f32 payload bit-exactly.  The one-hot P itself
        # is {0,1} — exact in a single bf16 — so it is cast down
        # explicitly: P is the dominant HBM traffic of the whole rebin
        # and the cast halves it without touching exactness.
        if dtp == jnp.float32:
            P = P.astype(jnp.bfloat16)
        out = jnp.einsum('zyxcl,zyxlk->zyxck', P, win,
                         preferred_element_type=dtp,
                         precision=jax.lax.Precision.HIGH)
        # slot ck received a candidate iff ck < n_claims (ranks are the
        # dense 0..n-1) — no second reduction over P needed
        cio = jax.lax.broadcasted_iota(
            jnp.int32, win.shape[:3] + (out_cap,), 3).astype(dtp)
        got = cio < nclaim[..., None]
        cols = jnp.where(got[..., None], out, fill)

    lost = jnp.sum(cols[..., CT] >= 0.0) != n_live0
    return cols, cap_ovf, lost


def cell_rebin_xsel_planes(gp, gv, gf, gim, gtag, gmass, cell_dim,
                           box_L, *, C):
    """Plane-layout xsel rebin for the plane-resident rebuild cycle:
    gp/gv/gf (3, nz, ny, nx, C) f32 component planes, gim same shape
    int, gtag/gmass (nz, ny, nx, C).  Identical staged selects as
    cell_rebin_xsel but with NO layout transposes on either side — the
    megastep kernel's plane state feeds straight in and out.

    Returns (gp', gv', gf', gim', gtag', gmass', cap_ovf, lost)."""
    dtp = gp.dtype
    itp = gtag.dtype
    L = jnp.asarray(box_L, dtp)
    half = 0.5 * L
    Lb = L.reshape(3, 1, 1, 1, 1)
    hb = half.reshape(3, 1, 1, 1, 1)
    shift = jnp.floor((gp + hb) / Lb)
    gp_w = gp - shift * Lb
    gim_w = gim + shift.astype(itp)
    cols = jnp.stack(
        [gp_w[0], gp_w[1], gp_w[2], gv[0], gv[1], gv[2],
         gf[0], gf[1], gf[2],
         gim_w[0].astype(dtp), gim_w[1].astype(dtp),
         gim_w[2].astype(dtp),
         gtag.astype(dtp), gmass], axis=-1)
    cols, cap_ovf, lost = _xsel_stages(cols, cell_dim, L, half, C,
                                       jnp.sum(gtag >= 0))

    def s3(i0):
        return jnp.stack([cols[..., i0], cols[..., i0 + 1],
                          cols[..., i0 + 2]])
    return (s3(0), s3(3), s3(6), s3(9).astype(itp),
            cols[..., 12].astype(itp), cols[..., 13], cap_ovf, lost)


def cell_rebin_xsel(pos, vel, frc, img, tag, mass, cell_dim, box_L, *,
                    C):
    """Pure-XLA staged-select rebin: three axis sweeps, each a batched
    one-hot MATMUL on the MXU.

    Per axis, every cell pulls its new occupants out of the 3C-lane
    candidate window (own slots + both neighbors', built by jnp.roll);
    the claim test is the GLOBAL bin index floor((x + L/2)/w) == own
    index — one value per candidate, identical from every viewing cell,
    so boundary rounding can never double- or zero-claim.  Compaction
    rank comes from an exclusive cumsum and placement is
    P (nc, C, 3C) @ window (nc, 3C, ch): a one-hot matmul, exact in any
    MXU precision (each output sums exactly one v*1.0 term — bf16x3
    splitting reconstructs f32 v exactly).  Positions are wrapped once
    up front (images adjusted), so no seam shifts ride the sweeps.

    Cost at 64k/C=40: ~3 x (window ~20MB + P ~50MB) of HBM traffic and
    ~200M MACs — well under 1 ms vs the Mosaic plane-local kernel's
    2.3 ms (latency-bound small-op chains) and the 12-operand sort's
    ~1.8 ms.

    Intermediate stages carry C + 16 slots: the staged re-bin resolves
    one axis at a time, so a cell's occupancy after the x or y stage
    transiently holds particles whose remaining axes still point
    elsewhere and can exceed the final-equilibrium C (seen at melt
    transients).  The final stage compacts back to C.

    Returns (pos', vel', frc', img', tag', mass', cap_ovf, lost):
    cap_ovf = a stage claimed more slots than its capacity (transient
    or final); lost = slot conservation failed (a particle out-ran the
    one-cell drift bound).  Both mean THIS rebuild is unusable — the
    caller retries the segment on the sort rebuild; neither implies the
    steady-state capacity C is wrong."""
    nx, ny, nz = cell_dim
    nc = nx * ny * nz
    dtp = pos.dtype
    itp = tag.dtype
    L = jnp.asarray(box_L, dtp)

    # wrap once; compute per-slot global bin targets
    half = 0.5 * L
    shift = jnp.floor((pos + half) / L)
    pos_w = pos - shift * L
    img_w = img + shift.astype(itp)
    live = (tag >= 0)

    # channel matrix (nz, ny, nx, C, ch): pos3 vel3 frc3 img3 tag mass.
    # Bin targets are NOT carried as channels — each axis stage
    # recomputes its own target from the window's position channel (one
    # fused VPU op on the window), saving 3 payload channels of matmul
    # and HBM traffic.
    def g(a):
        return a.reshape(nz, ny, nx, C)
    cols = jnp.stack(
        [g(pos_w[:, :, 0]), g(pos_w[:, :, 1]), g(pos_w[:, :, 2]),
         g(vel[:, :, 0]), g(vel[:, :, 1]), g(vel[:, :, 2]),
         g(frc[:, :, 0]), g(frc[:, :, 1]), g(frc[:, :, 2]),
         g(img_w[:, :, 0].astype(dtp)), g(img_w[:, :, 1].astype(dtp)),
         g(img_w[:, :, 2].astype(dtp)),
         g(tag.astype(dtp)), g(mass)], axis=-1)
    cols, cap_ovf, lost = _xsel_stages(cols, cell_dim, L, half, C,
                                       jnp.sum(live))

    def u3(i0):
        return cols[..., i0:i0 + 3].reshape(nc, C, 3)
    pos2 = u3(0)
    vel2 = u3(3)
    frc2 = u3(6)
    img2 = u3(9).astype(itp)
    tag2 = cols[..., 12].reshape(nc, C).astype(itp)
    mass2 = cols[..., 13].reshape(nc, C)
    return pos2, vel2, frc2, img2, tag2, mass2, cap_ovf, lost


@functools.partial(jax.jit,
                   static_argnames=('cell_dim', 'C', 'E', 'interpret',
                                    'variant'))
def cell_rebin_plane(pos, vel, frc, img, tag, mass, cell_dim, box_L, *,
                     C, E=8, interpret=False, variant='grid'):
    """Re-bin cell-major state by plane-local migration.

    pos/vel/frc (nc, C, 3) f32, img (nc, C, 3) int, tag (nc, C) int
    (-1 = padding), mass (nc, C); box_L (3,).  Returns the same tuple
    re-binned plus a sticky overflow bool.  Precondition: no particle
    has moved more than one cell along any axis since the last rebin
    (the engine's Verlet-skin danger bound guarantees this)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz = cell_dim
    nc = nx * ny * nz
    dtp = pos.dtype
    itp = tag.dtype

    def planes1(a):                                # (nc, C) -> planes
        return a.reshape(nz, ny, nx, C)

    def planes3(a, i):
        return a[:, :, i].reshape(nz, ny, nx, C)

    cols = jnp.stack([
        planes3(pos, 0), planes3(pos, 1), planes3(pos, 2),
        planes3(vel, 0), planes3(vel, 1), planes3(vel, 2),
        planes3(frc, 0), planes3(frc, 1), planes3(frc, 2),
        planes3(img.astype(dtp), 0), planes3(img.astype(dtp), 1),
        planes3(img.astype(dtp), 2),
        planes1(tag.astype(dtp)), planes1(mass)])
    L = jnp.asarray(box_L, dtp)
    par = jnp.stack([L[0], L[1], L[2], L[0] / nx, L[1] / ny, L[2] / nz,
                     jnp.zeros((), dtp), jnp.zeros((), dtp)])

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    shp = (NCOL, nz, ny, nx, C)
    if variant == 'select':
        # one grid-over-z pass: 3-plane-window z select + in-plane x/y
        # selects, all compactions straight out of 3C-lane candidate
        # windows (the force kernel's window trick applied to rebinning)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        cblk = pl.BlockSpec((NCOL, 1, ny, nx, C),
                            lambda i: (0, i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        blkm = pl.BlockSpec((NCOL, 1, ny, nx, C),
                            lambda i: (0, (i + nz - 1) % nz, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        blkp = pl.BlockSpec((NCOL, 1, ny, nx, C),
                            lambda i: (0, (i + 1) % nz, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        sblk = pl.BlockSpec((8, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
        out, st = pl.pallas_call(
            functools.partial(_kernel_rebin_select, nz=nz, ny=ny, nx=nx,
                              C=C),
            grid=(nz,),
            in_specs=[smem, blkm, cblk, blkp],
            out_specs=[cblk, sblk],
            out_shape=[jax.ShapeDtypeStruct(shp, dtp),
                       jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )(par.reshape(1, 8), cols, cols, cols)
    elif variant == 'grid':
        # two grid-over-z passes with static block indexing; ~6x faster
        # than the fori_loop variant (latency-bound dynamic plane
        # slicing) at production grids
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        cblk = pl.BlockSpec((NCOL, 1, ny, nx, C),
                            lambda i: (0, i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        eblk = pl.BlockSpec((2, 1, ny, nx, NCOL * E),
                            lambda i: (0, i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        sblk = pl.BlockSpec((8, 128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
        swept, emz, st1 = pl.pallas_call(
            functools.partial(_kernel_rebin_sweep, nz=nz, ny=ny, nx=nx,
                              C=C, E=E),
            grid=(nz,),
            in_specs=[smem, cblk],
            out_specs=[cblk, eblk, sblk],
            out_shape=[jax.ShapeDtypeStruct(shp, dtp),
                       jax.ShapeDtypeStruct((2, nz, ny, nx, NCOL * E),
                                            dtp),
                       jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )(par.reshape(1, 8), cols)
        epblk = pl.BlockSpec((1, 1, ny, nx, NCOL * E),
                             lambda i: (0, (i + nz - 1) % nz, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        emblk = pl.BlockSpec((1, 1, ny, nx, NCOL * E),
                             lambda i: (1, (i + 1) % nz, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        out, st2 = pl.pallas_call(
            functools.partial(_kernel_rebin_place, nz=nz, ny=ny, nx=nx,
                              C=C, E=E),
            grid=(nz,),
            in_specs=[smem, cblk, epblk, emblk],
            out_specs=[cblk, sblk],
            out_shape=[jax.ShapeDtypeStruct(shp, dtp),
                       jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )(par.reshape(1, 8), swept, emz, emz)
        st = jnp.maximum(st1, st2)
    else:
        out, st = pl.pallas_call(
            functools.partial(_kernel_rebin, nz=nz, ny=ny, nx=nx, C=C,
                              E=E, interpret=interpret),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vspec],
            out_specs=[vspec, vspec],
            out_shape=[jax.ShapeDtypeStruct(shp, dtp),
                       jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((2, nz, ny, nx, NCOL * E), dtp)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
            interpret=interpret,
        )(par.reshape(1, 8), cols)

    def unplane3(i0):
        return jnp.stack([out[i0 + i].reshape(nc, C) for i in range(3)],
                         axis=-1)
    pos2 = unplane3(PX)
    vel2 = unplane3(VX)
    frc2 = unplane3(FX)
    img2 = unplane3(IX).astype(itp)
    tag2 = out[TG].reshape(nc, C).astype(itp)
    mass2 = out[MS].reshape(nc, C)
    return pos2, vel2, frc2, img2, tag2, mass2, st[0, 0] > 0.5
