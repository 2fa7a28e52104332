#!/usr/bin/env python
"""All five driver benchmark configs (BASELINE.json `configs`).

Prints ONE JSON line per config:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

`vs_baseline` is against the 1e8 particle-steps/sec/chip north star for
the MD configs (BASELINE.md); HPMC reports trial-moves/s with
vs_baseline against the same 1e8 bar (the reference's GPU HPMC sweeps
are the same order as its MD steps — hpmc/IntegratorHPMCMonoGPU.cuh).

Usage:
  python bench_all.py            # all five
  python bench_all.py 1 3 5     # a subset (1-based config index)

Each config runs in a subprocess so compilation caches and global
context never bleed between configs.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

NORTH_STAR = 1.0e8


def _timed(system, steps):
    t0 = time.perf_counter()
    system.run(steps, quiet=True)
    return time.perf_counter() - t0


def config1_readme_lj():
    """README lj.py: 10x10x10 sc (N=1000), nlist.cell, Langevin dt=0.005.

    Reference: /root/reference/README.md quick-start script.
    """
    import hoomd_tpu as hoomd
    from hoomd_tpu import md

    hoomd.context.initialize("--notice-level=0")
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=2.0), n=10)
    system = hoomd.context.current.system
    N = system.state.N
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.langevin(group=hoomd.group.all(), kT=1.2, seed=4)
    system.run(2000, quiet=True)            # compile + equilibrate
    for _ in range(6):                       # cadence warmup
        system.run(1024, quiet=True)
    steps = 20000
    el = _timed(system, steps)
    pss = steps / el * N
    q = system.thermo_quantities()
    return {
        "metric": "readme_lj_n1000_langevin_particle_steps_per_sec",
        "value": pss, "unit": "particle-steps/s/chip",
        "vs_baseline": pss / NORTH_STAR,
        "extra": {"N": N, "tps": steps / el, "steps": steps,
                  "temperature": q['temperature'],
                  "fast_engine": bool(system._program.get('fast'))},
    }


def config2_lj_melt_64k():
    """LJ melt N=64k NVT — delegate to bench.py's main (same state point)."""
    out = subprocess.run([sys.executable, 'bench.py'],
                         capture_output=True, text=True, cwd='/root/repo')
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith('{'):
            return json.loads(line)
    raise RuntimeError(f"bench.py produced no JSON: {out.stderr[-800:]}")


def config3_kremer_grest():
    """Kremer-Grest melt: FENE bonds + WCA pairs + harmonic angles.

    1024 chains x 32 beads = 32768 particles at rho~0.85 (straight
    chains at 0.97 sigma bond length, columns on a square lattice).
    Reference analog: hoomd-benchmarks 'polymer' class;
    md/validation FENE stability.
    """
    import numpy as np

    import hoomd_tpu as hoomd
    from hoomd_tpu import md

    hoomd.context.initialize("--notice-level=0")
    n_chains, chain_len, bond = 1024, 32, 0.97
    N = n_chains * chain_len
    rho = 0.85
    Lz = chain_len * bond
    area = N / rho / Lz
    side = int(np.ceil(np.sqrt(n_chains)))
    dxy = np.sqrt(area) / side
    box_L = side * dxy
    snap = hoomd.data.make_snapshot(
        N, hoomd.data.boxdim(Lx=box_L, Ly=box_L, Lz=Lz),
        particle_types=['A'], bond_types=['polymer'],
        angle_types=['backbone'])
    idx = 0
    bonds, angles = [], []
    rng = np.random.RandomState(3)
    for c in range(n_chains):
        cx = (c % side + 0.5) * dxy - box_L / 2
        cy = (c // side + 0.5) * dxy - box_L / 2
        z0 = rng.uniform(0, bond)
        for m in range(chain_len):
            z = (z0 + m * bond) % Lz - Lz / 2
            snap.particles.position[idx] = [cx, cy, z]
            if m > 0:
                bonds.append([idx - 1, idx])
            if m > 1:
                angles.append([idx - 2, idx - 1, idx])
            idx += 1
    v = rng.normal(0, 1.0, (N, 3))
    v -= v.mean(axis=0)
    snap.particles.velocity[:] = v
    snap.bonds.resize(len(bonds)); snap.bonds.group[:] = bonds
    snap.angles.resize(len(angles)); snap.angles.group[:] = angles
    hoomd.init.read_snapshot(snap)
    system = hoomd.context.current.system

    nl = md.nlist.cell()
    wca = md.pair.lj(r_cut=2 ** (1 / 6), nlist=nl)
    wca.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    wca.set_params(mode='shift')
    fene = md.bond.fene()
    fene.bond_coeff.set('polymer', k=30.0, r0=1.5, sigma=1.0, epsilon=1.0)
    ang = md.angle.harmonic()
    ang.angle_coeff.set('backbone', k=1.5, t0=np.pi)
    mode = md.integrate.mode_standard(dt=0.001)
    md.integrate.langevin(group=hoomd.group.all(), kT=1.0, seed=17)
    system.run(1000, quiet=True)            # melt columns gently
    mode.set_params(dt=0.005)
    system.run(500, quiet=True)
    for _ in range(6):
        system.run(1024, quiet=True)
    steps = 2000
    el = _timed(system, steps)
    pss = steps / el * N
    q = system.thermo_quantities()
    return {
        "metric": "kremer_grest_32k_particle_steps_per_sec",
        "value": pss, "unit": "particle-steps/s/chip",
        "vs_baseline": pss / NORTH_STAR,
        "extra": {"N": N, "tps": steps / el, "steps": steps,
                  "temperature": q['temperature'],
                  "fast_engine": bool(system._program.get('fast'))},
    }


def config4_pppm_fluid():
    """Charged fluid with PPPM long-range electrostatics + short-range LJ.

    NaCl-like 1:1 electrolyte, N=4096 on a rocksalt start, NVT.
    Reference analog: md/charge.pppm + pair.ewald short range.
    """
    import numpy as np

    import hoomd_tpu as hoomd
    from hoomd_tpu import md

    hoomd.context.initialize("--notice-level=0")
    n = 16                                   # 16^3 = 4096, alternating charge
    a = 1.6
    L = n * a
    N = n ** 3
    snap = hoomd.data.make_snapshot(
        N, hoomd.data.boxdim(L=L), particle_types=['A', 'B'])
    idx = 0
    rng = np.random.RandomState(9)
    for i in range(n):
        for j in range(n):
            for k in range(n):
                snap.particles.position[idx] = [
                    (i + 0.5) * a - L / 2, (j + 0.5) * a - L / 2,
                    (k + 0.5) * a - L / 2]
                s = 1.0 if (i + j + k) % 2 == 0 else -1.0
                snap.particles.charge[idx] = s
                snap.particles.typeid[idx] = 0 if s > 0 else 1
                idx += 1
    v = rng.normal(0, 1.0, (N, 3)); v -= v.mean(axis=0)
    snap.particles.velocity[:] = v
    hoomd.init.read_snapshot(snap)
    system = hoomd.context.current.system

    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    for t1, t2 in [('A', 'A'), ('A', 'B'), ('B', 'B')]:
        lj.pair_coeff.set(t1, t2, epsilon=1.0, sigma=1.0)
    p = md.charge.pppm(group=hoomd.group.all(), nlist=nl)
    p.set_params(Nx=32, Ny=32, Nz=32, order=5, rcut=2.5)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.nvt(group=hoomd.group.all(), kT=1.0, tau=0.5)
    system.run(300, quiet=True)
    for _ in range(4):                       # cadence warmup
        system.run(512, quiet=True)
    steps = 1000
    el = _timed(system, steps)
    pss = steps / el * N
    q = system.thermo_quantities()
    fast = system._program.get('fast')
    return {
        "metric": "pppm_fluid_4k_particle_steps_per_sec",
        "value": pss, "unit": "particle-steps/s/chip",
        "vs_baseline": pss / NORTH_STAR,
        "extra": {"N": N, "tps": steps / el, "steps": steps,
                  "temperature": q['temperature'],
                  "fast_engine": bool(fast),
                  "fast_eval": fast.get('eval_name') if fast else None},
    }


def config5_hpmc_convex_polyhedra():
    """HPMC hard convex polyhedra (cubes), N=4096, trial-moves/s.

    Reference analog: hpmc.integrate.convex_polyhedron; GPU cell-set
    checkerboard scheme (hpmc/IntegratorHPMCMonoGPU.cuh:124-160).
    """
    import numpy as np

    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc

    hoomd.context.initialize("--notice-level=0")
    phi = 0.4                                # moderate-density cubes
    a = (1.0 / phi) ** (1.0 / 3.0)
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=16)
    system = hoomd.context.current.system
    N = system.state.N
    mc = hpmc.integrate.convex_polyhedron(seed=11, d=0.15, a=0.2)
    verts = 0.5 * np.array([[sx, sy, sz] for sx in (-1, 1)
                            for sy in (-1, 1) for sz in (-1, 1)])
    mc.shape_param.set('A', vertices=verts)
    system.run(50, quiet=True)               # compile + settle
    c0 = mc.get_counters()
    sweeps = 200
    t0 = time.perf_counter()
    system.run(sweeps, quiet=True)
    el = time.perf_counter() - t0
    c1 = mc.get_counters()
    moves = sum(int(c1[k]) - int(c0[k]) for k in (
        'translate_accept', 'translate_reject',
        'rotate_accept', 'rotate_reject'))
    mps = moves / el
    acc = (int(c1['translate_accept']) - int(c0['translate_accept'])) / max(
        1, int(c1['translate_accept']) - int(c0['translate_accept'])
        + int(c1['translate_reject']) - int(c0['translate_reject']))
    return {
        "metric": "hpmc_convex_polyhedra_4k_trial_moves_per_sec",
        "value": mps, "unit": "trial-moves/s/chip",
        "vs_baseline": mps / NORTH_STAR,
        "extra": {"N": N, "sweeps": sweeps, "elapsed_s": el,
                  "translate_acceptance": acc},
    }


CONFIGS = {
    1: config1_readme_lj,
    2: config2_lj_melt_64k,
    3: config3_kremer_grest,
    4: config4_pppm_fluid,
    5: config5_hpmc_convex_polyhedra,
}


def main(argv):
    picks = [int(x) for x in argv[1:]] or sorted(CONFIGS)
    if len(picks) == 1:
        print(json.dumps(CONFIGS[picks[0]]()))
        return 0
    # run each config in its own subprocess: fresh context, no cache bleed
    rc = 0
    for i in picks:
        out = subprocess.run(
            [sys.executable, __file__, str(i)],
            capture_output=True, text=True, cwd='/root/repo')
        line = next((l for l in reversed(out.stdout.strip().splitlines())
                     if l.startswith('{')), None)
        if line is None:
            print(json.dumps({"metric": f"config{i}", "value": None,
                              "unit": "error",
                              "vs_baseline": 0.0,
                              "extra": {"stderr": out.stderr[-400:]}}))
            rc = 1
        else:
            print(line)
    return rc


if __name__ == '__main__':
    sys.exit(main(sys.argv))
