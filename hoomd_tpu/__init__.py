"""hoomd_tpu — a TPU-native general-purpose particle simulation framework.

A from-scratch re-design of the HOOMD-blue v2.3 capability set
(molecular dynamics + hard-particle Monte Carlo, job-script API) for
TPU hardware: JAX/XLA/Pallas compute, one jitted step pipeline over
HBM-resident SoA state, `jax.sharding` meshes instead of MPI domain
decomposition.  Job scripts written for the reference API
(hoomd.context/init/md.pair/md.integrate/run) run near-verbatim:

    import hoomd_tpu as hoomd
    from hoomd_tpu import md
    hoomd.context.initialize("")
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=2.0), n=10)
    nl = md.nlist.cell()
    lj = md.pair.lj(r_cut=2.5, nlist=nl)
    lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
    md.integrate.mode_standard(dt=0.005)
    md.integrate.langevin(group=hoomd.group.all(), kT=0.2, seed=42)
    hoomd.run(10000)

(the reference README example, /root/reference/README.md:71-90).
"""

from __future__ import annotations

from . import (analyze, benchmark, cite, comm, compute, context, data, dump,
               ensemble, group, init, lattice, meta, option, update, util,
               variant)
from ._config import set_precision
from .snapshot import Snapshot

__version__ = "0.1.0"

__all__ = ['analyze', 'benchmark', 'cite', 'comm', 'compute', 'context',
           'data', 'dump', 'group', 'init', 'lattice', 'md', 'meta',
           'option', 'update', 'util', 'variant', 'run', 'run_upto',
           'get_step', 'set_precision', 'Snapshot', 'hpmc', 'parallel']


def run(tsteps, profile=False, quiet=False, callback=None,
        callback_period=0, limit_hours=None, limit_multiple=1):
    """Advance the simulation (reference hoomd.run, __init__.py:82)."""
    if context.current is None or context.current.system is None:
        raise RuntimeError("initialize the system before run()")
    context.current.system.run(int(tsteps), callback=callback,
                               callback_period=callback_period,
                               quiet=quiet, limit_hours=limit_hours,
                               limit_multiple=limit_multiple,
                               profile=profile)


def run_upto(step, **kwargs):
    """Run up to a given step (reference hoomd.run_upto) — the restartable
    job idiom."""
    cur = context.current.system.timestep
    if step > cur:
        run(step - cur, **kwargs)


def get_step():
    return context.current.system.timestep


# physics packages are imported lazily to keep bare-core imports light
_LAZY = ('md', 'hpmc', 'parallel', 'mpcd', 'dem', 'cgcmm', 'metal', 'jit',
         'deprecated', 'hdf5')


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(f'.{name}', __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
