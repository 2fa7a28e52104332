"""EAM pair potential (reference metal/EAMForceCompute.h, metal/pair.py:17).

Reads DYNAMO/LAMMPS 'setfl' (alloy) tabulated potential files:
U = sum_i F_ti(rho_i) + 1/2 sum_ij phi_titj(r_ij),
rho_i = sum_j rho_tj(r_ij).

The two-pass evaluation of the reference (density pass, then embedding-
derivative-aware force pass) maps to two vectorized sweeps over the padded
neighbor list with table interpolation (gather + lerp).  Table derivatives
are precomputed host-side; interpolation is linear over the file's fine
grids (the reference interpolates its tables similarly).
"""

from __future__ import annotations

import numpy as np

from .. import context
from .._config import PAD_COORD, int_dtype
from ..operation import Force


def _read_setfl(filename, type_names, fs=False):
    """Parse a setfl EAM file (public DYNAMO format).  ``fs=False``: the
    'alloy' layout (one density array per element, duplicated across
    neighbor types); ``fs=True``: Finnis-Sinclair layout — each element
    section carries ``nelem`` density arrays rho[elem][other] (reference
    EAMForceCompute.cc:188-211; density lookup rho[t_j][t_i],
    EAMForceCompute.cc:433-435)."""
    with open(filename) as f:
        lines = f.read().split('\n')
    # 3 comment lines
    head = lines[3].split()
    nelem = int(head[0])
    elements = head[1:1 + nelem]
    nrho, drho, nr, dr, rcut = lines[4].split()
    nrho, nr = int(nrho), int(nr)
    drho, dr, rcut = float(drho), float(dr), float(rcut)
    # flatten all remaining numbers
    vals = []
    i = 5
    mass = []
    F = []
    rho = []
    nrho_blk = nrho + (nelem * nr if fs else nr)
    while len(F) < nelem:
        hdr = lines[i].split()     # atomic number, mass, lattice, structure
        mass.append(float(hdr[1]))
        i += 1
        nums = []
        while len(nums) < nrho_blk:
            nums.extend(float(x) for x in lines[i].split())
            i += 1
        F.append(np.array(nums[:nrho]))
        blk = np.array(nums[nrho:nrho_blk])
        if fs:
            rho.append(blk.reshape(nelem, nr))      # rho[elem][other]
        else:
            rho.append(np.tile(blk, (nelem, 1)))
    # pair section: r*phi for i >= j ordering (i outer from 0..nelem-1)
    nums = []
    while i < len(lines):
        nums.extend(float(x) for x in lines[i].split())
        i += 1
    npair = nelem * (nelem + 1) // 2
    rphi = np.array(nums[:npair * nr]).reshape(npair, nr)
    return {'elements': elements, 'mass': mass, 'nrho': nrho,
            'drho': drho, 'nr': nr, 'dr': dr, 'rcut': rcut,
            'F': np.array(F), 'rho': np.array(rho),   # (ne, ne, nr)
            'rphi': rphi}


class eam(Force):
    """EAM force (reference metal.pair.eam):
    ``eam(file='Cu.eam.alloy', type='alloy', nlist=nl)``.
    Particle type names must match the element names in the file."""

    def __init__(self, file, type, nlist, name=None):
        Force.__init__(self, name)
        self._log_base = 'pair_eam_energy'
        if type not in ('alloy', 'fs'):
            raise ValueError("eam type must be 'alloy' or 'fs'")
        self._data = _read_setfl(file, None, fs=(type == 'fs'))
        self._nlist = nlist
        nlist.subscribe(self)
        context.current.system.add_force(self)

    def _rcut_matrix(self, types):
        nt = len(types)
        return np.full((nt, nt), self._data['rcut'])

    def _pack_params(self, system):
        import jax.numpy as jnp
        d = self._data
        types = system.particle_types
        elems = d['elements']
        order = []
        for t in types:
            if t not in elems:
                raise RuntimeError(
                    f"eam: particle type {t!r} not in file elements "
                    f"{elems}")
            order.append(elems.index(t))
        dt = system.real_dtype
        nt = len(types)
        ne = len(elems)

        def pidx(a, b):   # setfl pair ordering: for i, j <= i
            a, b = max(a, b), min(a, b)
            return a * (a + 1) // 2 + b
        rphi = np.zeros((nt, nt, d['nr']))
        for i in range(nt):
            for j in range(nt):
                rphi[i, j] = d['rphi'][pidx(order[i], order[j])]
        rho = d['rho'][np.ix_(order, order)]                  # (nt,nt,nr)
        return {
            'F': jnp.asarray(d['F'][order], dtype=dt),        # (nt, nrho)
            'rho': jnp.asarray(rho, dtype=dt),                # (nt,nt,nr)
            'rphi': jnp.asarray(rphi, dtype=dt),              # (nt,nt,nr)
            'drho': jnp.asarray(d['drho'], dt),
            'dr': jnp.asarray(d['dr'], dt),
            'rcut': jnp.asarray(d['rcut'], dt),
        }

    def _make_compute(self, system):
        import jax
        import jax.numpy as jnp
        nr = self._data['nr']
        nrho = self._data['nrho']

        def interp(table, x, dx, n):
            """Linear table interpolation with clamped index; returns
            (value, derivative)."""
            xi = x / dx
            i0 = jnp.clip(xi.astype(jnp.int32), 0, n - 2)
            frac = jnp.clip(xi - i0, 0.0, 1.0)
            t0 = jnp.take_along_axis(table, i0[..., None],
                                     axis=-1)[..., 0]
            t1 = jnp.take_along_axis(table, (i0 + 1)[..., None],
                                     axis=-1)[..., 0]
            return t0 * (1 - frac) + t1 * frac, (t1 - t0) / dx

        def compute(state, nl, params):
            idt = int_dtype()
            rdt = state.pos.dtype
            N, K = nl.idx.shape
            pos_pad = jnp.concatenate(
                [state.pos, jnp.full((1, 3), PAD_COORD, rdt)])
            t_pad = jnp.concatenate(
                [state.typeid, jnp.zeros((1,), idt)])
            j = nl.idx
            dr = state.box.min_image(state.pos[:, None, :] - pos_pad[j])
            r2 = jnp.sum(dr * dr, axis=-1)
            rcut = params['rcut']
            valid = (j < N) & (r2 < rcut * rcut)
            r = jnp.sqrt(jnp.where(valid, r2, 1.0))
            ti = state.typeid[:, None]
            tj = t_pad[j]

            # pass 1: density at each particle: rho[t_j][t_i]
            # (reference EAMForceCompute.cc:433-435)
            ti_b = jnp.broadcast_to(ti, (N, K))
            rho_tab_j = params['rho'][tj, ti_b]      # (N,K,nr)
            rho_ij, drho_ij = interp(rho_tab_j, r, params['dr'], nr)
            rho_i = jnp.sum(jnp.where(valid, rho_ij, 0.0), axis=1)

            # embedding energy + derivative
            F_tab = params['F'][state.typeid]        # (N, nrho)
            F_i, Fp_i = interp(F_tab, rho_i, params['drho'], nrho)

            # pass 2: forces
            Fp_pad = jnp.concatenate([Fp_i, jnp.zeros((1,), rdt)])
            rho_tab_i = params['rho'][ti_b, tj]      # rho[t_i][t_j]
            rho_ji, drho_ji = interp(rho_tab_i, r, params['dr'], nr)
            rphi_tab = params['rphi'][ti, tj]        # (N,K,nr)
            rphi, drphi = interp(rphi_tab, r, params['dr'], nr)
            phi = rphi / r
            dphi = (drphi - phi) / r
            fscal = -(Fp_i[:, None] * drho_ij + Fp_pad[j] * drho_ji
                      + dphi)
            fdivr = jnp.where(valid, fscal / r, 0.0)
            force = jnp.sum(fdivr[:, :, None] * dr, axis=1)
            pe = F_i + 0.5 * jnp.sum(jnp.where(valid, phi, 0.0), axis=1)
            pairs = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
            vir = jnp.stack(
                [0.5 * jnp.sum(fdivr * dr[:, :, a] * dr[:, :, b], axis=1)
                 for a, b in pairs], axis=-1)
            return force.astype(rdt), pe.astype(rdt), vir.astype(rdt)
        return compute
