"""Fast single-type LJ engine in cell-major layout.

Motivation (measured): the general engine's padded-neighbor-list force pass
is GATHER-bound on TPU — XLA lowers the (N, K) neighbor gathers to serial
element loads, capping throughput far below the hardware's FLOP rate.  This
engine removes every gather from the hot loop by keeping the *state itself*
in cell-major layout (ncells, C, ...):

  * drift/kick/thermostat are elementwise on padded slots,
  * forces come from the Pallas cell-pair kernel (ops/pallas_pair.py) —
    MXU matmuls + regular stencil DMA, zero gathers,
  * positions stay unwrapped between rebuilds so the stencil image shifts
    remain exact; a Verlet-skin displacement check (lax.cond) triggers
    re-binning (one sort) every ~r_buff/2 of motion, exactly the
    reference's rebuild cadence (md/NeighborList.cc:964).

The System routes eligible configurations here automatically
(single LJ pair, one type, orthorhombic 3D box, nve/nvt/langevin on all
particles); everything else uses the general engine.  Both paths share the
integrator mathematics so trajectories agree to f32 roundoff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .._config import PAD_COORD, int_dtype
from .. import rng as rng_mod
from .. import variant as variant_mod
from .pallas_pair import (build_cell_shifts, cell_pair_lj,
                          cell_pair_lj_pallas3d, cell_pair_lj_row,
                          cell_pair_lj_xla, cell_pair_plane,
                          cell_pair_planar, cell_pair_planar_n3l,
                          cell_pair_xla, cell_step_plane)


@struct.dataclass
class FastCarry:
    pos: jnp.ndarray        # (nc, C, 3) unwrapped since last rebuild
    vel: jnp.ndarray        # (nc, C, 3)
    frc: jnp.ndarray        # (nc, C, 3)
    pe: jnp.ndarray         # (nc, C)
    vir: jnp.ndarray        # (nc, C, 6)
    img: jnp.ndarray        # (nc, C, 3) int
    tag: jnp.ndarray        # (nc, C) int, -1 padding
    typ: jnp.ndarray        # (nc, C) int, 0 padding
    mass: jnp.ndarray       # (nc, C)
    ref_pos: jnp.ndarray    # (nc, C, 3) at last rebuild
    timestep: jnp.ndarray   # ()
    aux: dict               # thermostat variables
    overflow: jnp.ndarray   # () bool sticky
    n_rebuilds: jnp.ndarray  # () int
    danger: jnp.ndarray     # () bool sticky: skin crossed mid-window
    since: jnp.ndarray      # () int steps since last rebuild
    wmax: jnp.ndarray       # () max per-window drift^2 seen this segment
                            # (host feedback for the adaptive rebuild
                            # cadence; reset when the host reads it)
    rebin_ovf: jnp.ndarray  # () bool sticky: plane-local rebin buffer
                            # overflow — the carry is unusable; the host
                            # retries the segment on the sort rebuild
    bslots: tuple = ()      # per-bonded-kind (Mb, arity) SLOT tables —
                            # the tag group tables mapped through the
                            # current tag->slot assignment; recomputed at
                            # every rebuild so the hot loop reads cell
                            # slots directly (no tag-space detour)
    chain_miss: object = None   # () bool sticky (in-kernel chain-bonded
                            # engines only): a bonded partner fell
                            # outside the 27-cell stencil at a rebuild —
                            # the kernel's tag matching would silently
                            # drop the bond, so the host retries the
                            # segment on the one_step (XLA bonded) path


def plan_fast_lj(N, box_L, rcut, r_buff, conservative=False,
                 max_C=None, frac=None):
    """Static planning: cell grid and capacity.

    Kernel time is proportional to nc * C (the lane window always pads
    to one 128-lane tile and C to the 8-sublane granularity), so the
    planner scans the feasible cell grids (width >= rcut + r_buff,
    3C <= 128) and picks the one minimizing padded slots.

    Capacity model: by default C covers the mean occupancy plus ~5
    sigma of DENSE-LIQUID count fluctuations (measured sub-Poissonian,
    sigma ~ 0.5 sqrt(mean) — dense fluids strongly suppress density
    fluctuations, S(0) << 1).  That admits grids a Poissonian margin
    would reject — at the 64k bench point it unlocks (13,13,13)/C=40:
    6.6%% fewer padded slots AND 0.76 per-axis skins (vs 0.53), which
    stretches the rebuild cadence by nearly half.  A clustering or
    dilute system that overflows the dense margin triggers ONE replan
    with ``conservative=True`` (Poissonian margin, the round-2 model)
    via the sticky-overflow protocol before any in-place capacity
    growth — correctness never depends on the sizing guess."""
    import os
    w0 = rcut + r_buff
    L = np.asarray(box_L, float)
    dmax = tuple(max(1, int(np.floor(l / w0))) for l in L)
    ov = os.environ.get('HOOMD_TPU_FAST_GRID')
    if ov:
        # measurement override: "nx,ny,nz[,C]" pins the grid (and
        # optionally the capacity) for planner experiments
        parts = [int(x) for x in ov.split(',')]
        cdim = tuple(parts[:3])
        nc = int(np.prod(cdim))
        mean = N / nc
        C = parts[3] if len(parts) > 3 else \
            max(16, ((int(np.ceil(mean + 2.0 * np.sqrt(mean))) + 2 + 7)
                     // 8) * 8)
        return cdim, nc, C

    def cap_for(mean):
        # mean + 2 sqrt(mean) = ~4 sigma of the measured dense-liquid
        # count variance (sigma ~ 0.5 sqrt(mean)); the conservative
        # mode adds the +2 absolute pad of the round-2 model — in the
        # default mode that pad's job is done by the overflow-replan
        # protocol instead, and dropping it is exactly what admits the
        # larger-skin grids (at 64k: (13,13,13)/C=40 with 0.76 skins
        # vs (14,14,12) with 0.53)
        C = int(np.ceil(mean + 2.0 * np.sqrt(mean)))
        if conservative:
            C += 2
        return max(16, ((C + 7) // 8) * 8)

    from itertools import product

    _axcache = {}

    def _ax_idx(axis, r):
        key = (axis, r)
        if key not in _axcache:
            _axcache[key] = np.minimum(
                (frac[:, axis] * r).astype(np.int64), r - 1)
        return _axcache[key]

    def maxocc_of(cdim):
        """Exact max cell occupancy of the CURRENT configuration on
        grid ``cdim`` (frac = (N, 3) fractional positions, xyz cols)."""
        flat = (_ax_idx(0, cdim[0]) + cdim[0]
                * (_ax_idx(1, cdim[1])
                   + cdim[1] * _ax_idx(2, cdim[2])))
        return int(np.bincount(flat,
                               minlength=int(np.prod(cdim))).max())

    def cap_round(c):
        return max(16, ((int(c) + 7) // 8) * 8)

    # scan ALL feasible grids, not just the finest: kernel time is
    # structural (slots x 9 stencil rows x one 128-lane tile), so for
    # short-cutoff systems (e.g. WCA, rcut ~ 1.12) the slot-minimizing
    # grid is much COARSER than dmax — at the 32k Kremer-Grest point
    # the near-dmax scan picked (18,18,16)/C=16 = 83k slots where
    # (10,10,11)/C=40 = 45k slots (1.8x less kernel work) and a ~2.0
    # Verlet skin (vs 0.8) is feasible.  Wider cells only add MASKED
    # candidates inside the already-padded lane tile.
    #
    # Capacity is sized from BOTH the equilibrium count statistics
    # (cap_for) and the ACTUAL current occupancy when the caller
    # passes fractional positions: the mean-occupancy model alone
    # picks coarse grids that a clustered configuration (a polymer
    # bundle, a commensurate lattice start) instantly overflows at
    # ANY C <= 40 — the finer grid whose real occupancy is small is
    # the only feasible plan, and only the data can say so.
    ranges = [range(1, d + 1) for d in dmax]
    cands = []
    for cdim in product(*ranges):
        nc = int(np.prod(cdim))
        C = cap_for(N / nc)
        # sort key: (1) grids with any dimension < 3 rank last — a
        # 2-cell axis aliases the rebin roll windows (the same source
        # cell appears twice), which forces the slower sort rebuild
        # and disables the plane-resident cycle; (2) padded slots;
        # (3) fewest TRACED y-blocks (ceil(ny/7)) — every y-block is a
        # separately traced force body, and Mosaic compile time grows
        # superlinearly in body count (the chain-bonded scan at 3
        # blocks exceeded 9 minutes; 1 block compiles in ~1/3 of
        # that); (4) smallest z dimension — z is the rolled plane
        # loop, each iteration pays dynamic-slice machinery (cubic
        # boxes admit any axis permutation)
        key = (min(cdim) < 3, nc * C, -(-cdim[1] // 7), cdim[2],
               cdim[1])
        cands.append((key, cdim, nc, C))
    cands.sort(key=lambda t: t[0])
    best = None
    for key, cdim, nc, C in cands:
        if best is not None:
            # C only grows under the occupancy correction, so once the
            # MODEL slot count alone exceeds the best EFFECTIVE slot
            # count there is nothing better further down the list
            if (key[0], nc * C) > (best[0][0], best[0][1]):
                break
        if frac is not None:
            C = max(C, cap_round(maxocc_of(cdim) + 1))
            key = (key[0], nc * C) + key[2:]
        if 3 * C > 128:
            continue
        if max_C is not None and C > max_C:
            # chain-bonded + angle kernels OOM VMEM at C = 40 tiles
            # (measured 192M of 128M): the caller caps C and the scan
            # finds the best finer grid instead
            continue
        if best is None or key < best[0]:
            best = (key, cdim, nc, C)
    if best is None:
        # no grid fits the one-lane-tile window: fall back to the
        # coarsest grid and let C exceed the tile (correct, slower —
        # the caller degrades the kernel impl to XLA past one tile)
        nc = int(np.prod(dmax))
        C = cap_for(N / nc)
        if frac is not None:
            C = max(C, cap_round(maxocc_of(dmax) + 1))
        return dmax, nc, C
    _, cell_dim, ncells, C = best
    return cell_dim, ncells, C


def build_fast_lj_chunk(*, N, box, cell_dim, C, r_buff, rcut, method_kind,
                        method_seed, dtype, interpret=False,
                        impl='xla', eval_name='lj',
                        pnames=('lj1', 'lj2', 'rcut'), ntypes=1,
                        k_rebuild=8, rebin_impl='sort', rebin_E=16,
                        bonded_cfg=(), chain_cfg=None, charges=None,
                        mesh_cfg=None):
    """Returns (to_fast, run_chunk, to_state_fields).

    dyn layout: {'pv': [rc2, e_shift, *pnames] evaluator params, 'lj':
                 legacy (4,) LJ vector for the lj-only impls, 'dt': (),
                 'kT': packed variant, 'tau': (), 'gamma': (),
                 'bonded': tuple of per-group param dicts}.  Any
    single-type, charge/diameter-free evaluator from ops/pair_eval runs
    through the same planar stencil kernel ('planar'/'xla' impls).

    bonded_cfg: tuple of {'energy_fn', 'groups' (Mb, arity) tag table} —
    fixed-topology forces (bonds/angles/dihedrals + nlist-exclusion pair
    corrections) evaluated in SLOT space: at every rebuild the tag group
    tables are mapped through the new tag->slot assignment (one (M,)
    scatter), and the hot loop then gathers/scatter-adds directly on the
    cell-major flat layout via group autodiff (ops/bonded.py).  Tags
    remain the stable identity across rebuilds — the cell-major analog
    of the reference's BondedGroupData tag addressing
    (hoomd/BondedGroupData.h), with the rtag indirection amortized to
    rebuild boundaries instead of paid per step.

    chain_cfg (optional): static descriptor that moves LINEAR-CHAIN
    topologies (<=2 bond partners/particle; angles only on consecutive
    bonded triples — the Kremer-Grest/bead-spring family) INTO the
    megastep Pallas kernel: per-candidate tag matching against
    precomputed partner tables evaluates bond terms inside the stencil
    scan and extracts the partner vectors angle terms need (the TPU
    analog of md/PotentialBondGPU.cuh + HarmonicAngleForceComputeGPU).
    Keys: ptab (N+1, P int32 partner tags; P=2 or 4), aflag (N+1 int32
    angle role bits) or None, bond_kind ('fene'|'harmonic'), excl_bond,
    excl_13 (bools), has_ang.  bonded_cfg stays alongside for the
    pe/virial refresh and the one_step remainder path.
    """
    idt = int_dtype()
    nc = int(np.prod(cell_dim))
    M = nc * C
    # charged configs (ewald / lj_ewald real space + optional PPPM mesh
    # hook): charges are per-TAG constants, gathered to slots per step
    needs_q = charges is not None
    if needs_q:
        q_tab = jnp.concatenate([jnp.asarray(charges, dtype),
                                 jnp.zeros((1,), dtype)])
    L_np = np.asarray(box.L, dtype=np.float64)
    # the stencil covers all pairs within the actual cell width at
    # rebuild time, which is >= rcut + r_buff by construction; using the
    # real slack as the Verlet skin stretches the rebuild cadence for
    # free (rebuilds are the dominant non-kernel cost)
    skin = float(min(L_np[d] / cell_dim[d] for d in range(3)) - rcut)
    skin = max(skin, r_buff)
    # per-axis skins: stencil coverage is per-axis (a pair is missed
    # only when combined drift along ONE axis exceeds width_a - rcut),
    # so each axis earns its own danger budget — the wide axis of an
    # uneven grid is nearly free and isotropic movers gain ~sqrt(3)
    # rebuild cadence over a scalar-norm check
    skin3_np = np.maximum(L_np / np.asarray(cell_dim, float) - rcut,
                          r_buff)
    skin3 = jnp.asarray(skin3_np, dtype)
    inv_thr3 = jnp.asarray(1.0 / (0.5 * skin3_np) ** 2, dtype)
    adj_np, shift_np = build_cell_shifts(cell_dim, L_np)
    adj = jnp.asarray(adj_np)
    shifts = jnp.asarray(shift_np, dtype)
    nxyz = jnp.asarray(cell_dim, idt)
    ndof = 3.0 * N

    def _cid_flat(pos_w):
        f = box.make_fraction(pos_w)
        f = f - jnp.floor(f)
        c3 = jnp.clip((f * nxyz).astype(idt), 0, nxyz - 1)
        return c3[..., 0] + cell_dim[0] * (
            c3[..., 1] + cell_dim[1] * c3[..., 2])

    same_width = (jnp.dtype(dtype).itemsize
                  == jnp.dtype(idt).itemsize)

    def _rebin(pos_f, vel_f, img_f, tag_f, typ_f, mass_f, frc_f=None):
        """Flattened arrays -> fresh cell-major layout.

        ONE multi-operand lax.sort carries every per-particle column with
        the cell key (ints bitcast to the real dtype — the sort compares
        only the key), ranks come from an associative scan, and ONE wide
        row-scatter places the sorted rows into padded slots.  This
        replaces argsort + searchsorted + 5 gathers, which measured ~2x
        slower end-to-end on TPU (1-D gathers are ~0.75 ms each at
        M~110k; the 12-operand sort is ~1.8 ms total).  frc_f rides the
        sort as 3 extra columns when given (the fixed-cadence rebuild
        permutes live forces; the conversion path recomputes them)."""
        valid = tag_f >= 0
        pos_w, img_w = box.wrap(pos_f, img_f)
        cid = jnp.where(valid, _cid_flat(pos_w), nc).astype(idt)
        if not same_width:     # f64 mode: original gather-based path
            order = jnp.argsort(cid).astype(idt)
            scid = cid[order]
            first = jnp.searchsorted(scid, scid, side='left').astype(idt)
            rank = jnp.arange(M, dtype=idt) - first
            ok = (rank < C) & (scid < nc)
            slot = jnp.where(ok, scid * C + rank, M)
            src = jnp.full((M,), M, idt).at[slot].set(order, mode='drop')
            ovf = jnp.any((scid < nc) & (rank >= C))

            def take(a, fill):
                pad = jnp.concatenate(
                    [a, jnp.full((1,) + a.shape[1:], fill, a.dtype)])
                return pad[src]
            out = (take(pos_w, PAD_COORD), take(vel_f, 0),
                   take(img_w, 0), take(tag_f, -1), take(typ_f, 0),
                   take(mass_f, 1))
            if frc_f is not None:
                out = out + (take(frc_f, 0),)
            return out + (ovf,)

        def bc(a):
            return jax.lax.bitcast_convert_type(a, dtype)
        cols = (cid, pos_w[:, 0], pos_w[:, 1], pos_w[:, 2],
                vel_f[:, 0], vel_f[:, 1], vel_f[:, 2],
                bc(img_w[:, 0]), bc(img_w[:, 1]), bc(img_w[:, 2]),
                bc(tag_f), bc(typ_f), mass_f)
        if frc_f is not None:
            cols = cols + (frc_f[:, 0], frc_f[:, 1], frc_f[:, 2])
        s = jax.lax.sort(cols, num_keys=1)
        scid = s[0]
        idx = jnp.arange(M, dtype=idt)
        b = jnp.concatenate([jnp.ones((1,), bool),
                             scid[1:] != scid[:-1]])
        first = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(b, idx, 0))
        rank = idx - first
        ok = (rank < C) & (scid < nc)
        slot = jnp.where(ok, scid * C + rank, M)
        ovf = jnp.any((scid < nc) & (rank >= C))
        payload = jnp.stack(s[1:], axis=-1)            # (M, 12 [+3])
        fill = jnp.concatenate([
            jnp.full((3,), PAD_COORD, dtype), jnp.zeros((3,), dtype),
            bc(jnp.zeros((3,), idt)), bc(jnp.full((1,), -1, idt)),
            bc(jnp.zeros((1,), idt)), jnp.ones((1,), dtype)]
            + ([jnp.zeros((3,), dtype)] if frc_f is not None else []))
        out = jnp.tile(fill, (M, 1)).at[slot].set(payload, mode='drop')

        def ubc(a):
            return jax.lax.bitcast_convert_type(a, idt)
        res = (out[:, 0:3], out[:, 3:6], ubc(out[:, 6:9]),
               ubc(out[:, 9]), ubc(out[:, 10]), out[:, 11])
        if frc_f is not None:
            res = res + (out[:, 12:15],)
        return res + (ovf,)

    def _forces(pos_cells, typ_cells, dyn, want_pv=True, q_cells=None):
        if needs_q:
            # charge-consuming evaluators ride the planar row kernel
            # (charge window planes) or the XLA roll formulation; the
            # other impls have no charge channel
            if impl in ('plane', 'planar', 'planar_n3l'):
                return cell_pair_planar(
                    pos_cells.reshape(nc, C, 3), cell_dim, shifts,
                    dyn['pv'], C=C, eval_name=eval_name, pnames=pnames,
                    interpret=interpret, want_pv=want_pv, ntypes=ntypes,
                    cell_typ=(typ_cells.reshape(nc, C)
                              if ntypes > 1 else None),
                    cell_q=q_cells.reshape(nc, C))
            out = cell_pair_xla(pos_cells.reshape(nc, C, 3), cell_dim,
                                shifts, dyn['pv'], eval_name=eval_name,
                                pnames=pnames, ntypes=ntypes,
                                cell_typ=(typ_cells.reshape(nc, C)
                                          if ntypes > 1 else None),
                                cell_q=q_cells.reshape(nc, C))
            return out if want_pv else out[0]
        if impl == 'pallas':
            out = cell_pair_lj(pos_cells.reshape(nc, C, 3), adj,
                               shifts, dyn['lj'], ncells=nc, C=C,
                               interpret=interpret)
        elif impl == 'planar':
            return cell_pair_planar(
                pos_cells.reshape(nc, C, 3), cell_dim, shifts,
                dyn['pv'], C=C, eval_name=eval_name, pnames=pnames,
                interpret=interpret, want_pv=want_pv, ntypes=ntypes,
                cell_typ=(typ_cells.reshape(nc, C)
                          if ntypes > 1 else None))
        elif impl == 'plane':
            # plane-blocked full-stencil kernel (force only, single
            # type); pe/virial refreshes at chunk boundaries ride the
            # full planar row kernel
            if want_pv or ntypes > 1:
                return cell_pair_planar(
                    pos_cells.reshape(nc, C, 3), cell_dim, shifts,
                    dyn['pv'], C=C, eval_name=eval_name, pnames=pnames,
                    interpret=interpret, want_pv=want_pv, ntypes=ntypes,
                    cell_typ=(typ_cells.reshape(nc, C)
                              if ntypes > 1 else None))
            # fast reciprocal policy: the hardware approx reciprocal
            # (measured 1.6e-5 max rel err -> ~1e-4 on the LJ force) is
            # absorbed by a thermostat but would show up as NVE energy
            # drift, so NVE keeps the exact divide (the reference makes
            # the same speed/precision trade in HPMC overlap math,
            # HPMCPrecisionSetup.h:26-37)
            return cell_pair_plane(
                pos_cells.reshape(nc, C, 3), cell_dim, shifts,
                dyn['pv'], C=C, eval_name=eval_name, pnames=pnames,
                recip=('approx' if method_kind in ('nvt', 'langevin')
                       else 'div'),
                interpret=interpret)
        elif impl == 'planar_n3l':
            # half-stencil kernel is force-only; the rare pe/virial
            # refresh (chunk boundaries) rides the full planar kernel
            if want_pv:
                return cell_pair_planar(
                    pos_cells.reshape(nc, C, 3), cell_dim, shifts,
                    dyn['pv'], C=C, eval_name=eval_name, pnames=pnames,
                    interpret=interpret, want_pv=True, ntypes=ntypes,
                    cell_typ=(typ_cells.reshape(nc, C)
                              if ntypes > 1 else None))
            return cell_pair_planar_n3l(
                pos_cells.reshape(nc, C, 3), cell_dim, shifts,
                dyn['pv'], C=C, eval_name=eval_name, pnames=pnames,
                interpret=interpret, ntypes=ntypes,
                cell_typ=(typ_cells.reshape(nc, C)
                          if ntypes > 1 else None))
        elif impl in ('pallas3d', 'row'):
            kfn = (cell_pair_lj_row if impl == 'row'
                   else cell_pair_lj_pallas3d)
            if want_pv:
                # pe/virial are only read at chunk boundaries; the
                # (C, 6) virial layout is hostile to Mosaic, so the
                # rare full evaluation uses the XLA formulation and
                # only the force comes from the fast kernel
                frc = kfn(pos_cells.reshape(nc, C, 3), cell_dim, shifts,
                          dyn['lj'], C=C, interpret=interpret,
                          want_pv=False)
                _, pe, vir = cell_pair_lj_xla(
                    pos_cells.reshape(nc, C, 3), cell_dim, shifts,
                    dyn['lj'])
                return frc, pe, vir
            return kfn(pos_cells.reshape(nc, C, 3), cell_dim, shifts,
                       dyn['lj'], C=C, interpret=interpret,
                       want_pv=False)
        else:
            # unused pe/vir are dead-code-eliminated by XLA
            out = cell_pair_xla(pos_cells.reshape(nc, C, 3), cell_dim,
                                shifts, dyn['pv'], eval_name=eval_name,
                                pnames=pnames, ntypes=ntypes,
                                cell_typ=(typ_cells.reshape(nc, C)
                                          if ntypes > 1 else None))
        return out if want_pv else out[0]

    have_bonded = len(bonded_cfg) > 0
    if have_bonded:
        from .bonded import bonded_force
        bond_groups = tuple(jnp.asarray(cfg['groups'], idt)
                            for cfg in bonded_cfg)
    have_chain = chain_cfg is not None
    if have_chain:
        chain_ptab = jnp.asarray(chain_cfg['ptab'], idt)    # (N+1, P)
        chain_P = int(chain_ptab.shape[1])
        chain_af = (jnp.asarray(chain_cfg['aflag'], idt)
                    if chain_cfg.get('aflag') is not None else None)
        chain_static = (chain_cfg['bond_kind'], chain_P,
                        bool(chain_cfg['has_ang']),
                        bool(chain_cfg['excl_bond']),
                        bool(chain_cfg['excl_13']))
        grid_i = jnp.asarray(cell_dim, idt)

        def _chain_planes(tag_cells):
            """Partner-tag (and angle-flag) planes for the current
            layout: one (M, P) gather per rebuild window dispatch."""
            tag_f = tag_cells.reshape(M)
            sel = jnp.minimum(jnp.where(tag_f >= 0, tag_f, N), N)
            bp = chain_ptab[sel]                       # (M, P)
            # sentinel N (never a real or pad tag) for invalid slots
            bp = jnp.where((tag_f >= 0)[:, None], bp, N)
            plane4 = (cell_dim[2], cell_dim[1], cell_dim[0], C)
            gbp = jnp.transpose(bp.reshape(plane4 + (chain_P,)),
                                (4, 0, 1, 2, 3))
            if chain_af is None:
                return gbp, None
            af = jnp.where(tag_f >= 0, chain_af[sel], 0)
            return gbp, af.reshape(plane4)

        def _chain_miss_of(tag_cells):
            """True iff any bonded partner pair spans >1 cell along
            any axis in THIS layout — the 27-cell stencil would miss
            it.  Evaluated once per rebuild (cells are fixed within a
            window, so matching cannot decay mid-window)."""
            tag_f = tag_cells.reshape(M)
            slot_cell = jnp.arange(M, dtype=idt) // C
            c3 = jnp.stack([slot_cell % cell_dim[0],
                            (slot_cell // cell_dim[0]) % cell_dim[1],
                            slot_cell // (cell_dim[0] * cell_dim[1])],
                           axis=-1)                     # (M, 3)
            sel = jnp.where(tag_f >= 0, tag_f, N)
            s2c = jnp.zeros((N + 1, 3), idt).at[sel].set(
                c3, mode='drop')
            bp = chain_ptab[jnp.minimum(sel, N)]       # (M, P)
            pc = s2c[jnp.clip(bp, 0, N)]               # (M, P, 3)
            d = jnp.abs(pc - c3[:, None, :])
            ok = (d <= 1) | (d >= grid_i[None, None] - 1)
            valid = (bp < N) & (tag_f >= 0)[:, None]
            return jnp.any(valid & ~jnp.all(ok, axis=-1))
    else:
        def _chain_miss_of(tag_cells):
            return jnp.zeros((), bool)

    def _slot_groups(tag_cells):
        """Tag group tables -> SLOT group tables for the current layout.

        Between rebuilds every particle keeps its slot, so the slot
        tables are valid for the whole rebuild window; recomputing them
        is one (M,) scatter + small gathers per rebuild.  Padding group
        rows (tag index >= N) map to the sentinel slot M, which
        bonded_force masks out (its 'index >= N' convention with N=M
        here)."""
        if not have_bonded:
            return ()
        tag_f = tag_cells.reshape(M)
        s_of_t = jnp.full((N + 1,), M, idt).at[
            jnp.where(tag_f >= 0, tag_f, N)].set(
            jnp.where(tag_f >= 0, jnp.arange(M, dtype=idt), M),
            mode='drop')
        return tuple(s_of_t[jnp.minimum(g, N)] for g in bond_groups)

    def _bonded_terms(pos_cells, bslots, dyn, want_pv):
        """Fixed-topology force terms evaluated directly in SLOT space.

        The carry's bslots tables (tag groups mapped through the current
        tag->slot assignment at the last rebuild) let every gather and
        scatter-add run on the cell-major flat layout — no per-step
        (N+1,3) tag-space scatter + gather-back detour.  Returns
        cell-layout (frc, pe, vir) additions; pe/vir are None when
        want_pv is False (hot loop).  pos_cells may be unwrapped
        (between rebuilds); box.min_image inside bonded_force absorbs
        the skin-bounded excursion."""
        pos_flat = pos_cells.reshape(M, 3)
        f = jnp.zeros((M, 3), dtype)
        pe = jnp.zeros((M,), dtype)
        vir = jnp.zeros((M, 6), dtype)
        for i, cfg in enumerate(bonded_cfg):
            fb, peb, virb = bonded_force(
                pos_flat, box, bslots[i], dyn['bonded'][i],
                cfg['energy_fn'])
            f = f + fb
            if want_pv:
                pe = pe + peb
                vir = vir + virb
        if want_pv:
            return (f.reshape(nc, C, 3), pe.reshape(nc, C),
                    vir.reshape(nc, C, 6))
        return f.reshape(nc, C, 3), None, None

    def one_step(c: FastCarry, dyn):
        dt = dyn['dt']
        valid = (c.tag >= 0)[..., None]
        minv = 1.0 / c.mass[..., None]

        # ---- step 1 (drift; thermostat pre-scale for nvt)
        aux = dict(c.aux)
        vel = c.vel
        if method_kind == 'nvt':
            kT0 = variant_mod.eval_packed(dyn['kT'], c.timestep)
            ke2 = jnp.sum(jnp.where(valid, c.mass[..., None] * vel * vel,
                                    0.0))
            T = ke2 / ndof
            xi = aux['xi'] + 0.5 * dt * (T / kT0 - 1.0) / dyn['tau'] ** 2
            s = jnp.exp(-0.5 * dt * xi)
            vel = jnp.where(valid, vel * s, vel)
            aux['xi'] = xi
            aux['eta'] = aux['eta'] + dt * xi
        vel = jnp.where(valid, vel + 0.5 * dt * c.frc * minv, vel)
        pos = jnp.where(valid, c.pos + dt * vel, c.pos)   # NO wrap here

        # ---- skin monitor (NO branch: a per-step lax.cond costs ~1 ms
        # on TPU even when not taken — measured; rebuilds instead run on
        # a fixed cadence between step windows, the reference's
        # check_period design, NeighborList.h check_period).  Forces this
        # step are exact iff max displacement since the last rebuild is
        # under skin/2; crossing mid-window raises the sticky danger
        # flag and the host retries the segment with a smaller window
        # (the reference only warns on dangerous builds; the retry makes
        # the fixed cadence exact).
        d = pos - c.ref_pos
        # EXACT pair bound, per axis (see _kernel_megastep): danger
        # iff the two largest per-axis drifts sum past that axis'
        # skin; reported as the normalized ratio ((d1+d2)/skin_a)^2
        md2 = c.wmax * 0.0
        dv = jnp.where(valid, d, 0.0)
        for a in range(3):
            q = dv[..., a] * dv[..., a]
            m1 = jnp.max(q)
            eq = q == m1
            tie = jnp.sum(jnp.where(eq, 1.0, 0.0)) > 1.5
            m2 = jnp.maximum(jnp.max(jnp.where(eq, -1.0, q)), 0.0)
            m2 = jnp.where(tie, m1, m2)
            sd = 0.5 * (jnp.sqrt(m1 * inv_thr3[a])
                        + jnp.sqrt(m2 * inv_thr3[a]))
            md2 = jnp.maximum(md2, sd * sd)
        danger = c.danger | (md2 > 1.0)
        wmax = jnp.maximum(c.wmax, md2)
        img, tag, typ, mass = c.img, c.tag, c.typ, c.mass

        # ---- forces (Pallas cell-pair kernel); pe/virial are NOT
        # computed in the hot loop — refresh_forces fills them at chunk
        # boundaries before any observer reads them
        if needs_q:
            q_cells = jnp.where(tag >= 0,
                                q_tab[jnp.minimum(
                                    jnp.maximum(tag, 0), N)], 0.0)
            frc = _forces(pos, typ, dyn, want_pv=False,
                          q_cells=q_cells)
            if mesh_cfg is not None:
                fm, _, _ = mesh_cfg['fn'](pos.reshape(M, 3),
                                          q_cells.reshape(M),
                                          box, dyn['mesh'],
                                          want_pv=False)
                frc = frc + fm.reshape(nc, C, 3)
        else:
            frc = _forces(pos, typ, dyn, want_pv=False)
        if have_bonded:
            fb, _, _ = _bonded_terms(pos, c.bslots, dyn, want_pv=False)
            frc = frc + fb
        frc = jnp.where(valid, frc, 0.0)

        # ---- step 2 (kick; thermostat post-scale / langevin bath)
        if method_kind == 'langevin':
            kT = variant_mod.eval_packed(dyn['kT'], c.timestep)
            gamma = dyn['gamma']
            # per-slot counter hash keyed (seed, timestep, tag, axis):
            # zero gathers, and the SAME stream the megastep kernel
            # draws, so window and remainder steps share one bath
            # (reference keying discipline: Saru.h:51-58)
            from . import hashrng
            u = jnp.stack(
                [hashrng.uniform_pm1(method_seed, c.timestep, tag,
                                     salt=ax) for ax in (1, 2, 3)],
                axis=-1).astype(dtype)
            noise = jnp.sqrt(6.0 * gamma * kT / dt) * u
            f_tot = frc + noise - gamma * vel
            f_tot = jnp.where(valid, f_tot, 0.0)
            vel = jnp.where(valid, vel + 0.5 * dt * f_tot * minv, vel)
            frc = f_tot
        else:
            vel = jnp.where(valid, vel + 0.5 * dt * frc * minv, vel)
            if method_kind == 'nvt':
                kT0 = variant_mod.eval_packed(dyn['kT'], c.timestep)
                xi = aux['xi']
                s = jnp.exp(-0.5 * dt * xi)
                vel = jnp.where(valid, vel * s, vel)
                ke2 = jnp.sum(jnp.where(valid,
                                        mass[..., None] * vel * vel, 0.0))
                T = ke2 / ndof
                aux['xi'] = xi + 0.5 * dt * (T / kT0 - 1.0) \
                    / dyn['tau'] ** 2

        return FastCarry(pos=pos, vel=vel, frc=frc, pe=c.pe, vir=c.vir,
                         img=img, tag=tag, typ=typ, mass=mass,
                         ref_pos=c.ref_pos, timestep=c.timestep + 1,
                         aux=aux, overflow=c.overflow, danger=danger,
                         n_rebuilds=c.n_rebuilds, since=c.since + 1,
                         wmax=wmax, rebin_ovf=c.rebin_ovf,
                         bslots=c.bslots, chain_miss=c.chain_miss)

    # ---- fully-fused step path (one pallas_call per MD step) -----------
    # Eligible: 'plane' impl, single type, nve/nvt (langevin keeps the
    # XLA step-2 for its RNG).  The carry is transposed to plane layout
    # once per rebuild window, not per step.  MEASURED SLOWER than the
    # separate force kernel + XLA integrator on TPU v5e (36.1M vs 38.2M
    # pss at 64k: the 13 plane input streams and the per-plane KE/max-
    # displacement reductions outweigh the saved XLA passes), so it is
    # opt-in until the lean leapfrog-storage variant lands.
    import os as _os
    use_fused = (impl == 'plane' and ntypes == 1 and not have_bonded
                 and not needs_q
                 and method_kind in ('nve', 'nvt')
                 and _os.environ.get('HOOMD_TPU_FUSED') == 'on')
    # window-resident mega kernel: k full VV steps in one pallas_call,
    # state VMEM-resident throughout (default hot path on TPU); bonded
    # terms need the tag scatter between force and kick, so they ride
    # the per-step one_step path instead
    # langevin rides the megastep via the in-kernel counter-RNG bath;
    # chain topologies (see chain_cfg) ride it via in-scan tag matching
    # charged configs stay on the per-step path: the PPPM mesh hook
    # (FFTs) cannot run inside a Mosaic kernel
    use_mega = (impl == 'plane' and ntypes == 1
                and (not have_bonded or have_chain) and not needs_q
                and method_kind in ('nve', 'nvt', 'langevin')
                and _os.environ.get('HOOMD_TPU_MEGA', 'on') != 'off')
    # probe-only knob: drop the in-kernel drift monitor (UNSAFE — the
    # danger/retry protocol goes blind; for cost measurement only)
    _monitor = _os.environ.get('HOOMD_TPU_MEGA_MONITOR', 'on') != 'off'

    def _noise_planes(tag_any, dyn, ts, k):
        """(k, 3, nz, ny, nx, C) Langevin noise planes for the window
        starting at traced timestep ts: the per-(seed, tag, step)
        counter-hash stream (identical bits to one_step), amplitude
        sqrt(6 gamma kT(t) / dt), masked to valid slots."""
        from . import hashrng
        plane4 = (cell_dim[2], cell_dim[1], cell_dim[0], C)
        tag_p = tag_any.reshape(plane4)
        kt = variant_mod.eval_packed(dyn['kT'],
                                     ts + jnp.arange(k, dtype=idt))
        amp = jnp.sqrt(6.0 * dyn['gamma'] * kt / dyn['dt'])   # (k,)
        ts_vec = (ts + jnp.arange(k, dtype=idt)).reshape(
            k, 1, 1, 1, 1).astype(jnp.int32)
        u = jnp.stack(
            [hashrng.uniform_pm1(method_seed, ts_vec, tag_p[None],
                                 salt=ax)
             for ax in (1, 2, 3)], axis=1)    # (k, 3, nz, ny, nx, C)
        valid = (tag_p >= 0).astype(dtype)
        return (amp.reshape(k, 1, 1, 1, 1, 1) * u.astype(dtype)
                * valid[None, None])

    def mega_windows(c: FastCarry, dyn, nw, k):
        """nw chained megastep windows (k fused VV steps each), the
        state plane-resident throughout — transposes happen once per
        call, not per window.  Drift is monitored against c.ref_pos, so
        the danger check stays exact across chained windows and the
        REBUILD CADENCE becomes a runtime quantity (nw is traced): the
        host stretches/shrinks it from measured drift without paying a
        kernel recompile (each distinct kernel k costs a full Mosaic
        compile — the old design that tied cadence == kernel window was
        stuck at whatever k it first compiled)."""
        from .pallas_pair import cell_megastep_planes
        if method_kind == 'nvt':
            ti2 = 1.0 / dyn['tau'] ** 2
        else:
            ti2 = jnp.zeros((), dtype)
        aux = dict(c.aux)
        plane4 = (cell_dim[2], cell_dim[1], cell_dim[0], C)
        gw = (1.0 / c.mass).reshape(plane4)
        gm = c.mass.reshape(plane4)
        gr = _to_planes(c.ref_pos)
        gtag = c.tag.reshape(plane4) if have_chain else None
        gbp = gaf = None
        if have_chain:
            gbp, gaf = _chain_planes(c.tag)
        ck = dict(gt=gtag,
                  gamma=dyn['gamma'],
                  bonded=chain_static if have_chain else None,
                  bpar=dyn.get('bpar') if have_chain else None,
                  gbp=gbp, gaf=gaf)
        if method_kind == 'langevin':
            noise_tag = c.tag
        else:
            noise_tag = None
        st0 = (_to_planes(c.pos), _to_planes(c.vel), _to_planes(c.frc),
               aux.get('xi', jnp.zeros((), dtype)),
               aux.get('eta', jnp.zeros((), dtype)),
               c.danger, c.wmax, c.timestep)

        def w(_, st):
            gp, gv, gf, xi, eta, danger, wmax, ts = st
            if method_kind in ('nvt', 'langevin'):
                kt = variant_mod.eval_packed(
                    dyn['kT'], ts + jnp.arange(k, dtype=idt))
            else:
                kt = jnp.ones((k,), dtype)
            gn = (_noise_planes(noise_tag, dyn, ts, k)
                  if method_kind == 'langevin' else None)
            gp, gv, gf, xi, eta, d, _, mdmax = cell_megastep_planes(
                gp, gv, gf, gw, gm, gr, cell_dim, shifts, dyn['pv'],
                dyn['dt'], kt, xi, eta, skin3, C=C, k=k,
                method=method_kind, eval_name=eval_name, pnames=pnames,
                recip=('approx' if method_kind in ('nvt', 'langevin')
                       else 'div'),
                ndof=ndof, tau_inv2=ti2, interpret=interpret,
                monitor=_monitor, gn=gn, **ck)
            return (gp, gv, gf, xi, eta, danger | d,
                    jnp.maximum(wmax, mdmax), ts + k)

        st = jax.lax.fori_loop(0, nw, w, st0)
        gp, gv, gf, xi, eta, danger, wmax, ts = st
        if method_kind == 'nvt':
            aux['xi'] = xi
            aux['eta'] = eta
        return c.replace(pos=_from_planes(gp), vel=_from_planes(gv),
                         frc=_from_planes(gf), aux=aux, danger=danger,
                         wmax=wmax, timestep=ts,
                         since=c.since + nw * k)

    def _to_planes(a):
        return jnp.transpose(a.reshape(cell_dim[2], cell_dim[1],
                                       cell_dim[0], C, 3),
                             (4, 0, 1, 2, 3))

    def _from_planes(a):
        return jnp.transpose(a, (1, 2, 3, 4, 0)).reshape(nc, C, 3)

    def fused_steps(c: FastCarry, dyn, m):
        """m fused velocity-Verlet steps (kernel-resident drift/force/
        kick; scalar thermostat algebra between kernel calls)."""
        from .pallas_pair import cell_step_plane_planes
        dt = dyn['dt']
        gp = _to_planes(c.pos)
        gv = _to_planes(c.vel)
        gf = _to_planes(c.frc)
        gr = _to_planes(c.ref_pos)
        gw = (1.0 / c.mass).reshape(cell_dim[2], cell_dim[1],
                                    cell_dim[0], C)
        ke2 = jnp.sum(c.mass[..., None] * c.vel * c.vel)
        aux = dict(c.aux)
        xi0 = aux.get('xi', jnp.zeros((), dtype))
        eta0 = aux.get('eta', jnp.zeros((), dtype))
        thr = jnp.asarray((0.5 * skin) ** 2, dtype)

        def body(_, st):
            gp, gv, gf, ke2, xi, eta, danger, ts = st
            if method_kind == 'nvt':
                kT0 = variant_mod.eval_packed(dyn['kT'], ts)
                T = ke2 / ndof
                xi1 = xi + 0.5 * dt * (T / kT0 - 1.0) / dyn['tau'] ** 2
                s = jnp.exp(-0.5 * dt * xi1)
                eta = eta + dt * xi1
            else:
                xi1 = xi
                s = jnp.ones((), dtype)
            gp, gv, gf, ke2n, md2 = cell_step_plane_planes(
                gp, gv, gf, gw, gr, cell_dim, shifts, dyn['pv'], dt, s,
                C=C, eval_name=eval_name, pnames=pnames,
                recip=('approx' if method_kind == 'nvt' else 'div'),
                interpret=interpret)
            if method_kind == 'nvt':
                xi = xi1 + 0.5 * dt * (ke2n / ndof / kT0 - 1.0) \
                    / dyn['tau'] ** 2
            else:
                xi = xi1
            danger = danger | (md2 > thr)
            return (gp, gv, gf, ke2n, xi, eta, danger, ts + 1)

        st = jax.lax.fori_loop(0, m, body, (gp, gv, gf, ke2, xi0, eta0,
                                            c.danger, c.timestep))
        gp, gv, gf, _, xi, eta, danger, ts = st
        if method_kind == 'nvt':
            aux['xi'] = xi
            aux['eta'] = eta
        return c.replace(pos=_from_planes(gp), vel=_from_planes(gv),
                         frc=_from_planes(gf), aux=aux, danger=danger,
                         timestep=ts, since=c.since + m)

    def rebuild_carry(c: FastCarry):
        """Unconditional re-bin into fresh cell-major layout (forces
        ride the sort so the next half-kick sees them in slot order).

        rebin_impl='pallas' routes to the plane-local migration stencil
        (ops/pallas_rebin.py) — eligible because the engine's danger
        protocol bounds inter-rebuild drift to half the Verlet skin,
        far under one cell width, so migration is nearest-neighbor
        only.  Its buffer-overflow flag is sticky on the carry; the
        host retries the segment on the sort path (same protocol as
        capacity overflow)."""
        if rebin_impl == 'xsel':
            from .pallas_rebin import cell_rebin_xsel
            p, v, f, im, t, m, cap_o, lost = cell_rebin_xsel(
                c.pos, c.vel, c.frc, c.img, c.tag, c.mass,
                tuple(cell_dim), jnp.asarray(L_np, dtype), C=C)
            # typ stays: ntypes == 1 (gated by the caller).  Any xsel
            # failure (transient stage overflow or conservation miss)
            # makes THIS rebuild unusable: sort-rebuild retry.  It does
            # NOT imply C is too small — the sort rebuild's own flag
            # judges that.
            return c.replace(
                pos=p, vel=v, img=im, tag=t, mass=m, ref_pos=p, frc=f,
                rebin_ovf=c.rebin_ovf | cap_o | lost,
                n_rebuilds=c.n_rebuilds + 1,
                since=jnp.zeros((), idt),
                bslots=_slot_groups(t),
                chain_miss=(c.chain_miss | _chain_miss_of(t)
                            if have_chain else c.chain_miss))
        if rebin_impl == 'pallas':
            from .pallas_rebin import cell_rebin_plane
            p, v, f, im, t, m, o = cell_rebin_plane(
                c.pos, c.vel, c.frc, c.img, c.tag, c.mass,
                tuple(cell_dim), jnp.asarray(L_np, dtype),
                C=C, E=rebin_E, interpret=interpret)
            # typ stays: ntypes == 1 (gated by the caller), so valid
            # slots and padding both carry type 0
            return c.replace(
                pos=p, vel=v, img=im, tag=t, mass=m, ref_pos=p, frc=f,
                rebin_ovf=c.rebin_ovf | o,
                n_rebuilds=c.n_rebuilds + 1,
                since=jnp.zeros((), idt),
                bslots=_slot_groups(t),
                chain_miss=(c.chain_miss | _chain_miss_of(t)
                            if have_chain else c.chain_miss))
        p, v, im, t, ty, m, f, o = _rebin(
            c.pos.reshape(M, 3), c.vel.reshape(M, 3),
            c.img.reshape(M, 3), c.tag.reshape(M), c.typ.reshape(M),
            c.mass.reshape(M), c.frc.reshape(M, 3))
        p = p.reshape(nc, C, 3)
        return c.replace(
            pos=p, vel=v.reshape(nc, C, 3), img=im.reshape(nc, C, 3),
            tag=t.reshape(nc, C), typ=ty.reshape(nc, C),
            mass=m.reshape(nc, C), ref_pos=p, frc=f.reshape(nc, C, 3),
            overflow=c.overflow | o, n_rebuilds=c.n_rebuilds + 1,
            since=jnp.zeros((), idt),
            bslots=_slot_groups(t),
            chain_miss=(c.chain_miss | _chain_miss_of(t)
                        if have_chain else c.chain_miss))

    # plane-resident rebuild cycles: when the megastep kernel (plane
    # layout) pairs with the xsel rebin, the whole cycles loop can stay
    # in plane layout — the rebin consumes and produces component
    # planes directly (cell_rebin_xsel_planes), so the 7 layout
    # transposes per cycle (4 in, 3 out of the window call, ~0.09 ms
    # each at 64k) disappear entirely; transposes happen once per
    # run_cycles dispatch instead of once per rebuild cycle.
    use_plane_cycles = use_mega and rebin_impl == 'xsel' \
        and (not have_bonded or have_chain)

    def _plane_cycles(c: FastCarry, dyn, ncycles, nwin, k):
        from .pallas_pair import cell_megastep_planes
        from .pallas_rebin import cell_rebin_xsel_planes
        if method_kind == 'nvt':
            ti2 = 1.0 / dyn['tau'] ** 2
        else:
            ti2 = jnp.zeros((), dtype)
        plane4 = (cell_dim[2], cell_dim[1], cell_dim[0], C)
        aux = dict(c.aux)
        gL = jnp.asarray(L_np, dtype)

        def _planes_i(a):           # (nc, C, 3) int -> (3, nz, ny, nx, C)
            return jnp.transpose(a.reshape(plane4 + (3,)),
                                 (4, 0, 1, 2, 3))

        cmiss0 = c.chain_miss if have_chain else jnp.zeros((), bool)
        st0 = (_to_planes(c.pos), _to_planes(c.vel), _to_planes(c.frc),
               _planes_i(c.img), c.tag.reshape(plane4),
               c.mass.reshape(plane4),
               aux.get('xi', jnp.zeros((), dtype)),
               aux.get('eta', jnp.zeros((), dtype)),
               c.danger, c.wmax, c.timestep, c.rebin_ovf, c.n_rebuilds,
               # drift reference: c.ref_pos for the FIRST cycle (the
               # orchestrator enters with a fresh rebuild so ref == pos,
               # but exported run.cycles callers may not), replaced by
               # the rebin output after each in-loop rebuild
               _to_planes(c.ref_pos), cmiss0)

        def cyc(_, st):
            (gp, gv, gf, gim, gtag, gmass, xi, eta, danger, wmax, ts,
             rbo, nreb, gr, cmiss) = st
            gw = 1.0 / gmass
            gbp = gaf = None
            if have_chain:
                gbp, gaf = _chain_planes(gtag)
            ck = dict(gt=gtag if have_chain else None,
                      gamma=dyn['gamma'],
                      bonded=chain_static if have_chain else None,
                      bpar=dyn.get('bpar') if have_chain else None,
                      gbp=gbp, gaf=gaf)

            def w(_, wst):
                gp, gv, gf, xi, eta, danger, wmax, ts = wst
                if method_kind in ('nvt', 'langevin'):
                    kt = variant_mod.eval_packed(
                        dyn['kT'], ts + jnp.arange(k, dtype=idt))
                else:
                    kt = jnp.ones((k,), dtype)
                gn = (_noise_planes(gtag, dyn, ts, k)
                      if method_kind == 'langevin' else None)
                gp, gv, gf, xi, eta, d, _, mdmax = cell_megastep_planes(
                    gp, gv, gf, gw, gmass, gr, cell_dim, shifts,
                    dyn['pv'], dyn['dt'], kt, xi, eta, skin3, C=C, k=k,
                    method=method_kind, eval_name=eval_name,
                    pnames=pnames,
                    recip=('approx' if method_kind in ('nvt', 'langevin')
                           else 'div'),
                    ndof=ndof, tau_inv2=ti2, interpret=interpret,
                    monitor=_monitor, gn=gn, **ck)
                return (gp, gv, gf, xi, eta, danger | d,
                        jnp.maximum(wmax, mdmax), ts + k)

            gp, gv, gf, xi, eta, danger, wmax, ts = jax.lax.fori_loop(
                0, nwin, w, (gp, gv, gf, xi, eta, danger, wmax, ts))
            gp, gv, gf, gim, gtag, gmass, cap_o, lost = \
                cell_rebin_xsel_planes(gp, gv, gf, gim, gtag, gmass,
                                       tuple(cell_dim), gL, C=C)
            if have_chain:
                cmiss = cmiss | _chain_miss_of(gtag)
            return (gp, gv, gf, gim, gtag, gmass, xi, eta, danger,
                    wmax, ts, rbo | cap_o | lost, nreb + 1, gp, cmiss)

        st = jax.lax.fori_loop(0, ncycles, cyc, st0)
        (gp, gv, gf, gim, gtag, gmass, xi, eta, danger, wmax, ts,
         rbo, nreb, _gr, cmiss) = st
        if method_kind == 'nvt':
            aux['xi'] = xi
            aux['eta'] = eta
        pos2 = _from_planes(gp)

        def _unplanes_i(a):
            return jnp.transpose(a, (1, 2, 3, 4, 0)).reshape(nc, C, 3)

        # typ stays: ntypes == 1 (gated by use_mega's builder checks)
        tag2 = gtag.reshape(nc, C)
        return c.replace(
            pos=pos2, vel=_from_planes(gv), frc=_from_planes(gf),
            img=_unplanes_i(gim), tag=tag2,
            mass=gmass.reshape(nc, C), ref_pos=pos2, aux=aux,
            danger=danger, wmax=wmax, timestep=ts,
            rebin_ovf=rbo, n_rebuilds=nreb,
            since=jnp.zeros((), idt),
            # remainder one_step calls read slot tables for the CURRENT
            # layout; the flag gates the host's fallback protocol
            bslots=_slot_groups(tag2),
            chain_miss=(cmiss if have_chain else c.chain_miss))

    @functools.partial(jax.jit, static_argnames=('k',))
    def run_cycles(carry, dyn, ncycles, nwin, *, k):
        """ncycles rebuild cycles, each = nwin megastep windows of k
        steps followed by one rebuild.  nwin is TRACED: the rebuild
        cadence k*nwin adapts at runtime with no recompile."""
        if use_plane_cycles:
            return _plane_cycles(carry, dyn, ncycles, nwin, k)

        def cyc(_, c):
            if use_mega:
                c = mega_windows(c, dyn, nwin, k)
            elif use_fused:
                c = fused_steps(c, dyn, nwin * k)
            else:
                c = jax.lax.fori_loop(
                    0, nwin * k, lambda _, cc: one_step(cc, dyn), c)
            return rebuild_carry(c)
        return jax.lax.fori_loop(0, ncycles, cyc, carry)

    @functools.partial(jax.jit, static_argnames=('k',))
    def run_wins(carry, dyn, nwin, *, k):
        """nwin megastep windows (dynamic count), no rebuild."""
        if use_mega:
            return mega_windows(carry, dyn, nwin, k)
        if use_fused:
            return fused_steps(carry, dyn, nwin * k)
        return jax.lax.fori_loop(
            0, nwin * k, lambda _, c: one_step(c, dyn), carry)

    @jax.jit
    def run_steps(carry, dyn, m):
        """m plain steps (dynamic trip count), no rebuild."""
        if use_fused:
            return fused_steps(carry, dyn, m)
        return jax.lax.fori_loop(
            0, m, lambda _, c: one_step(c, dyn), carry)

    @jax.jit
    def run_rebuild(carry, dyn):
        return rebuild_carry(carry)

    def run(carry, dyn, nsteps, nwin=1):
        """Host orchestrator: rebuild cycles of k_rebuild*nwin steps
        (nwin is the host-adapted window count — traced, so adapting
        the cadence costs nothing), honoring the carry's current
        steps-since-rebuild; head/tail run as whole windows plus a
        dynamic remainder.  At most 5 device dispatches per call."""
        k = k_rebuild
        nwin = max(int(nwin), 1)
        cadence = k * nwin
        left = int(nsteps)
        since = int(carry.since)
        if since > 0 and since + left > cadence:
            head = max(cadence - since, 0)
            if head > 0:
                hw, hrem = divmod(head, k)
                if hw > 0:
                    carry = run_wins(carry, dyn, jnp.asarray(hw, idt),
                                     k=k)
                if hrem > 0:
                    carry = run_steps(carry, dyn, jnp.asarray(hrem, idt))
                left -= head
            carry = run_rebuild(carry, dyn)
        nb = left // cadence
        if nb > 0:
            carry = run_cycles(carry, dyn, jnp.asarray(nb, idt),
                               jnp.asarray(nwin, idt), k=k)
            left -= nb * cadence
        tw, trem = divmod(left, k)
        if tw > 0:
            carry = run_wins(carry, dyn, jnp.asarray(tw, idt), k=k)
        if trem > 0:
            carry = run_steps(carry, dyn, jnp.asarray(trem, idt))
        return carry

    # expose the phases for profiling probes (scratch/ tooling)
    run.rebuild = run_rebuild
    run.wins = run_wins
    run.cycles = run_cycles

    # ---- conversions -------------------------------------------------------
    @jax.jit
    def to_fast(state, aux):
        pos_f = state.pos
        p, v, im, t, ty, m, ovf = _rebin(
            jnp.concatenate([pos_f,
                             jnp.full((M - N, 3), PAD_COORD, dtype)]),
            jnp.concatenate([state.vel, jnp.zeros((M - N, 3), dtype)]),
            jnp.concatenate([state.image,
                             jnp.zeros((M - N, 3), idt)]),
            jnp.concatenate([state.tag,
                             jnp.full((M - N,), -1, idt)]),
            jnp.concatenate([state.typeid.astype(idt),
                             jnp.zeros((M - N,), idt)]),
            jnp.concatenate([state.mass, jnp.ones((M - N,), dtype)]))
        shape3 = (nc, C, 3)
        # net_force is recomputed with refresh_forces after conversion
        # (one kernel call) rather than permuted alongside
        carry = FastCarry(
            pos=p.reshape(shape3), vel=v.reshape(shape3),
            frc=jnp.zeros(shape3, dtype),
            pe=jnp.zeros((nc, C), dtype),
            vir=jnp.zeros((nc, C, 6), dtype),
            img=im.reshape(shape3), tag=t.reshape(nc, C),
            typ=ty.reshape(nc, C),
            mass=m.reshape(nc, C),
            ref_pos=p.reshape(shape3),
            timestep=state.timestep, aux=aux,
            overflow=ovf, n_rebuilds=jnp.zeros((), idt),
            danger=jnp.zeros((), bool), since=jnp.zeros((), idt),
            wmax=jnp.zeros((), dtype),
            rebin_ovf=jnp.zeros((), bool),
            bslots=_slot_groups(t.reshape(nc, C)),
            chain_miss=(_chain_miss_of(t.reshape(nc, C))
                        if have_chain else None))
        return carry

    @jax.jit
    def refresh_forces(carry, dyn):
        if needs_q:
            qc = jnp.where(carry.tag >= 0,
                           q_tab[jnp.minimum(
                               jnp.maximum(carry.tag, 0), N)], 0.0)
            frc, pe, vir = _forces(carry.pos, carry.typ, dyn,
                                   q_cells=qc)
            if mesh_cfg is not None:
                fm, pm, vm = mesh_cfg['fn'](carry.pos.reshape(M, 3),
                                            qc.reshape(M), box,
                                            dyn['mesh'], want_pv=True)
                frc = frc + fm.reshape(nc, C, 3)
                pe = pe + pm.reshape(nc, C)
                vir = vir + vm.reshape(nc, C, 6)
        else:
            frc, pe, vir = _forces(carry.pos, carry.typ, dyn)
        if have_bonded:
            fb, peb, virb = _bonded_terms(carry.pos, carry.bslots, dyn,
                                          want_pv=True)
            frc, pe, vir = frc + fb, pe + peb, vir + virb
        valid = (carry.tag >= 0)[..., None]
        return carry.replace(frc=jnp.where(valid, frc, 0.0), pe=pe,
                             vir=vir)

    @jax.jit
    def to_state(carry, state):
        """Scatter fast-layout arrays back into the State by tag order
        preserved via each slot's tag."""
        tag_f = carry.tag.reshape(M)
        sel = jnp.minimum(jnp.where(tag_f >= 0, tag_f, N), N)
        # state slot of each fast slot: rtag[tag]; padding rows route to
        # the out-of-bounds index N and are DROPPED (an in-bounds clamp
        # would race with the genuine write to slot N-1)
        rt_pad = jnp.concatenate([state.rtag, jnp.zeros((1,), idt)])
        dst = jnp.where(tag_f >= 0, rt_pad[sel], N)

        def scat(dest, src):
            return dest.at[dst].set(src, mode='drop')
        pos_w, img_w = box.wrap(carry.pos.reshape(M, 3),
                                carry.img.reshape(M, 3))
        new = state.replace(
            pos=scat(state.pos, pos_w),
            vel=scat(state.vel, carry.vel.reshape(M, 3)),
            image=scat(state.image, img_w),
            net_force=scat(state.net_force, carry.frc.reshape(M, 3)),
            net_pe=scat(state.net_pe, carry.pe.reshape(M)),
            net_virial=scat(state.net_virial, carry.vir.reshape(M, 6)),
            timestep=carry.timestep)
        return new

    return to_fast, refresh_forces, run, to_state
