#!/usr/bin/env python
"""Driver benchmark: LJ melt, N=64k, NVT (BASELINE.json config 2).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is against the 1e8 particle-steps/sec/chip north star
(BASELINE.md).

Runs on whatever JAX platform is active (the driver provides one real TPU
chip).  State point: the classic LJ liquid benchmark rho*=0.8442, T*=1.2,
r_cut=2.5, r_buff=0.4 (matches the glotzerlab hoomd-benchmarks lj-liquid
configuration class).
"""

from __future__ import annotations

import json
import sys
import time


def main():
    import hoomd_tpu as hoomd
    from hoomd_tpu import md

    hoomd.context.initialize("--notice-level=0")
    n = 40                              # 40^3 sc = 64000 particles
    rho = 0.8442
    a = (1.0 / rho) ** (1.0 / 3.0)
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=n)
    system = hoomd.context.current.system
    N = system.state.N

    # thermal velocities
    import numpy as np
    rng = np.random.RandomState(1)
    snap = system.take_snapshot()
    v = rng.normal(0, np.sqrt(1.2), (N, 3))
    v -= v.mean(axis=0)
    snap.particles.velocity[:] = v
    system.restore_snapshot(snap)

    nl = md.nlist.cell(r_buff=0.4)
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    lj.set_params(mode='shift')
    md.integrate.mode_standard(dt=0.005)
    md.integrate.nvt(group=hoomd.group.all(), kT=1.2, tau=0.5)

    # warmup: compile + melt the lattice + settle nlist capacities
    system.run(500, quiet=True)

    steps = 3000
    t0 = time.perf_counter()
    system.run(steps, quiet=True)
    elapsed = time.perf_counter() - t0
    tps = steps / elapsed
    pss = tps * N

    print(json.dumps({
        "metric": "lj_melt_64k_nvt_particle_steps_per_sec",
        "value": pss,
        "unit": "particle-steps/s/chip",
        "vs_baseline": pss / 1.0e8,
        "extra": {"N": N, "tps": tps, "steps": steps,
                  "elapsed_s": elapsed,
                  "n_rebuilds": int(system._nl_data[0].n_rebuilds),
                  "temperature": system.thermo_quantities()['temperature']},
    }))


if __name__ == '__main__':
    sys.exit(main())
