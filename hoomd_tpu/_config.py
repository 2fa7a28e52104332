"""Global runtime configuration for hoomd_tpu.

Replaces HOOMD's compile-time precision option (reference
hoomd/HOOMDMath.h:55-70, ``Scalar = double`` unless SINGLE_PRECISION): here
precision is a runtime switch.  The default is single precision, which is the
TPU-native fast path (f32 on the VPU/MXU); double precision is available for
physics-parity validation (XLA emulates f64 on TPU, and tests run it on CPU).

Thermodynamic reductions always accumulate more carefully than the state dtype
(see ops/reduce.py) so that energy-conservation measurements are meaningful at
f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_REAL_DTYPE = jnp.float32
_INT_DTYPE = jnp.int32


def set_precision(mode: str) -> None:
    """Select the floating point width of the particle state.

    ``"single"`` (default) keeps everything in f32.  ``"double"`` enables
    JAX x64 globally and stores the state in f64 — the analog of building the
    reference without SINGLE_PRECISION (HOOMDMath.h:55-70).
    """
    global _REAL_DTYPE
    if mode == "single":
        _REAL_DTYPE = jnp.float32
    elif mode == "double":
        jax.config.update("jax_enable_x64", True)
        _REAL_DTYPE = jnp.float64
    else:
        raise ValueError(f"unknown precision mode {mode!r} (single|double)")


def real_dtype():
    """dtype of positions/velocities/forces (HOOMD's ``Scalar``)."""
    return _REAL_DTYPE


def int_dtype():
    return _INT_DTYPE


# Sentinel coordinate used for the padding row appended to position arrays;
# any distance against it is far outside every cutoff, so padded neighbor
# slots mask themselves out of force sums without explicit branches.
PAD_COORD = 1.0e9
