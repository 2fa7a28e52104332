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
        # remaining reference flags (--gpu, --nx, --linear, --onelevel,
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
    if opts.notice_level >= 2:
        print(f"hoomd_tpu: JAX {jax.__version__} on "
              f"{len(jax.devices())} device(s): "
              f"{ctx.device.platform}", file=sys.stderr)
    current = ctx
    return ctx
