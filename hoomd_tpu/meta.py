"""Simulation metadata dump (reference hoomd/meta.py:56)."""

from __future__ import annotations

import datetime
import json
import platform

from . import context


def dump_metadata(filename=None, user=None, indent=4):
    import jax
    meta = {
        'timestamp': datetime.datetime.now().isoformat(),
        'platform': platform.platform(),
        'backend': f"jax-{jax.__version__}",
        'devices': [str(d) for d in jax.devices()],
    }
    sys_ = context.current.system if context.current else None
    if sys_ is not None:
        meta['hoomd_tpu'] = {
            'timestep': sys_.timestep,
            'num_particles': sys_.state.N,
            'particle_types': sys_.particle_types,
            'forces': [f.name for f in sys_.forces],
            'integration_methods': [type(m).__name__ for m in sys_.methods],
            'dt': (sys_.integrator_mode.dt if sys_.integrator_mode
                   else None),
        }
    if user:
        meta['user'] = user
    if filename:
        with open(filename, 'w') as f:
            json.dump(meta, f, indent=indent)
    return meta
