"""Time-dependent scalar values (reference hoomd/variant.py:40-143,
hoomd/Variant.h:98).

``constant`` wraps a number; ``linear_interp`` interpolates a point list.
Variants evaluate inside jit (``jnp.interp`` over the point table) so
time-dependent thermostat/barostat setpoints and box resizes never leave the
device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class _variant:
    def value(self, step):  # host-side evaluation
        raise NotImplementedError

    def eval_jax(self, timestep, dtype):  # traced evaluation
        raise NotImplementedError

    def pack(self, dtype):
        """(xs, ys) tables used by eval_jax; constants get 1-point tables
        so every variant has the same pytree structure."""
        raise NotImplementedError


class constant(_variant):
    """Fixed value (reference variant._constant)."""

    def __init__(self, val):
        self.val = float(val)

    def value(self, step):
        return self.val

    def pack(self, dtype):
        return (jnp.asarray([0.0], dtype=dtype),
                jnp.asarray([self.val], dtype=dtype))


class linear_interp(_variant):
    """Piecewise-linear point list (reference variant.linear_interp):
    points = [(step, value), ...]; ``zero`` offsets the time origin."""

    def __init__(self, points, zero='now'):
        if zero == 'now':
            from . import context
            zero = (0 if context.current is None
                    or context.current.system is None
                    else context.current.system.timestep)
        self.zero = int(zero)
        pts = sorted((float(t), float(v)) for t, v in points)
        self.xs = np.array([t for t, _ in pts]) + self.zero
        self.ys = np.array([v for _, v in pts])

    def value(self, step):
        return float(np.interp(step, self.xs, self.ys))

    def pack(self, dtype):
        return (jnp.asarray(self.xs, dtype=dtype),
                jnp.asarray(self.ys, dtype=dtype))


def as_variant(v):
    if isinstance(v, _variant):
        return v
    return constant(v)


def eval_packed(packed, timestep):
    """Evaluate a packed variant table at a traced timestep."""
    xs, ys = packed
    return jnp.interp(timestep.astype(ys.dtype), xs, ys)
