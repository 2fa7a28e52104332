"""Simulation context (reference hoomd/context.py:111-278).

The reference's ExecutionConfiguration work — GPU selection, MPI rank setup —
collapses on TPU to JAX device/mesh discovery; ``initialize`` records
options, resets the current SimulationContext and reports the devices.
"""

from __future__ import annotations

import os
import shlex
import sys

current = None


class options:
    """Parsed command-line-style options
    (reference hoomd/option.py:72-210)."""

    def __init__(self):
        self.mode = 'auto'
        self.notice_level = 2
        self.msg_file = None
        self.user = []
        self.nrank = None
        self.nx = None
        self.ny = None
        self.nz = None
        self.single_mpi = False
        self.autotuner_enable = True


class SimulationContext:
    """Tracks the current simulation (reference SimulationContext,
    context.py:111-160)."""

    def __init__(self):
        self.system = None
        self.sorter = None
        self.integrator = None
        self.options = options()
        self.device = None
        self.mesh = None            # jax.sharding.Mesh when --nrank/--nx..
        self.dd_shape = None        # (Sz, Sy, Sx) when --nx/--ny/--nz

    def __enter__(self):
        global current
        self._prev = current
        current = self
        return self

    def __exit__(self, *exc):
        global current
        current = self._prev


def initialize(args=None, memory_traceback=False):
    """Parse options and set up a fresh context
    (reference context.initialize, context.py:187)."""
    global current
    ctx = SimulationContext()
    opts = ctx.options
    argv = shlex.split(args) if isinstance(args, str) else \
        (list(args) if args is not None else [])
    it = iter(argv)
    for tok in it:
        if tok.startswith('--mode'):
            opts.mode = tok.split('=', 1)[1] if '=' in tok else next(it)
        elif tok.startswith('--notice-level'):
            v = tok.split('=', 1)[1] if '=' in tok else next(it)
            opts.notice_level = int(v)
        elif tok.startswith('--msg-file'):
            opts.msg_file = tok.split('=', 1)[1] if '=' in tok else next(it)
        elif tok.startswith('--user'):
            opts.user = shlex.split(
                tok.split('=', 1)[1] if '=' in tok else next(it))
        elif tok.startswith('--nrank'):
            v = tok.split('=', 1)[1] if '=' in tok else next(it)
            opts.nrank = int(v)
        elif tok.startswith('--nx'):
            v = tok.split('=', 1)[1] if '=' in tok else next(it)
            opts.nx = int(v)
        elif tok.startswith('--ny'):
            v = tok.split('=', 1)[1] if '=' in tok else next(it)
            opts.ny = int(v)
        elif tok.startswith('--nz'):
            v = tok.split('=', 1)[1] if '=' in tok else next(it)
            opts.nz = int(v)
        # remaining reference flags (--gpu, --linear, --onelevel,
        # --nthreads, ...) have no TPU meaning and are accepted silently
    import jax
    # persistent compilation cache: the fused/stencil Pallas kernels
    # take minutes to compile; caching them across processes makes
    # repeat job-script runs start in seconds (reference analog: CUDA's
    # on-disk kernel cache).  Opt out with HOOMD_TPU_NO_COMPILE_CACHE.
    if not os.environ.get('HOOMD_TPU_NO_COMPILE_CACHE'):
        try:
            cache_dir = os.environ.get(
                'HOOMD_TPU_COMPILE_CACHE',
                os.path.expanduser('~/.cache/hoomd_tpu_xla'))
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update('jax_compilation_cache_dir', cache_dir)
            jax.config.update('jax_persistent_cache_min_compile_time_secs',
                              1.0)
        except Exception:
            pass
    ctx.device = jax.devices()[0]
    # multi-device execution (the reference's MPI rank grid,
    # hoomd/ExecutionConfiguration.cc + DomainDecomposition.h:49-175):
    # --nrank=N (or --nx/--ny/--nz whose product is N) lays the
    # simulation over an N-device 1-D 'domain' mesh.  The job-script
    # engine runs unchanged: state arrays are sharded over the particle
    # axis with jax.sharding.NamedSharding and XLA's SPMD partitioner
    # inserts the collectives (the "annotate shardings, let XLA insert
    # collectives" recipe) — there is no per-rank code path to keep in
    # sync with the single-chip one.
    n_req = opts.nrank
    grid = [g for g in (opts.nx, opts.ny, opts.nz) if g]
    if grid:
        prod = 1
        for g in grid:
            prod *= g
        if n_req is not None and prod != n_req:
            # the reference errors on an infeasible nx/ny/nz vs nranks
            # (DomainDecomposition.cc:323 findDecomposition)
            raise RuntimeError(
                f"--nx/--ny/--nz grid product {prod} does not match "
                f"--nrank={n_req}")
        n_req = prod
    if n_req is not None and n_req < 1:
        raise RuntimeError(f"--nrank={n_req} must be >= 1")
    # n_req == 1 with an explicit grid still builds the (trivial) mesh:
    # a 1x1x1 DD run exercises the spatial-DD engine on one chip, which
    # is how its per-chip speed is measured against the single-chip
    # fast engine (no multi-chip hardware needed)
    if n_req is not None and (n_req > 1 or grid):
        devs = jax.devices()
        if len(devs) < n_req:
            raise RuntimeError(
                f"--nrank={n_req} requested but only {len(devs)} JAX "
                f"device(s) visible (reference analog: mpirun -n vs "
                f"world size). Set XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_req} with "
                f"JAX_PLATFORMS=cpu to oversubscribe for testing.")
        import numpy as _np
        from jax.sharding import Mesh
        ctx.mesh = Mesh(_np.asarray(devs[:n_req]), ('domain',))
        # an explicit --nx/--ny/--nz grid additionally requests SPATIAL
        # domain decomposition (the reference's DomainDecomposition rank
        # grid, hoomd/DomainDecomposition.h:49-175): eligible MD configs
        # route to the cell-major spatial DD engine
        # (parallel/fastdd.py); everything else keeps the 1-D
        # atom-decomposition sharding above
        if grid:
            ctx.dd_shape = (opts.nz or 1, opts.ny or 1, opts.nx or 1)
    if opts.notice_level >= 2:
        print(f"hoomd_tpu: JAX {jax.__version__} on "
              f"{len(jax.devices())} device(s): "
              f"{ctx.device.platform}", file=sys.stderr)
    current = ctx
    return ctx
