"""Counter-based per-particle RNG that traces in BOTH XLA and Mosaic.

The reference's Saru PRNG is a stateless counter generator keyed by
(seed, particle tag, timestep) (hoomd/Saru.h:51-121; per-particle use
md/TwoStepLangevin.cc:40-43).  ``jax.random`` keeps that discipline on
the general engine, but its draws are INDEXED arrays (a (N, 3) table
gathered by tag) — an O(N) gather per step that the cell-major fast
engine cannot afford, and ``jax.random`` cannot run inside a Mosaic
kernel at all.

This module is the fast-engine analog: a murmur3-finalizer counter hash
evaluated PER SLOT directly on the tag array — zero gathers, no global
table, identical results whether traced by XLA (one_step, fastdd) or by
Mosaic (the megastep kernel), so every fast-engine path draws from the
same stream.  Like the reference, we keep Saru's *keying discipline*
(seed, tag, timestep[, axis]), not its bit stream.

Statistical quality: two chained murmur3 finalizers give full avalanche
on the 32-bit counter; moments and independence are asserted in
tests/test_hashrng.py.  All arithmetic is int32 add/xor/multiply and
LOGICAL right shifts (int32 multiply wraps mod 2^32 in XLA and Mosaic
alike), so the streams are bit-identical across backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# murmur3 / splitmix constants (public domain); kept as python ints
# and materialized at trace time so Pallas kernels see literals, not
# captured device constants
_C1 = -2048144789     # 0x85ebca6b
_C2 = -1028477387     # 0xc2b2ae35
_PHI = -1640531527    # 0x9e3779b9 (golden-ratio increment)


def _shr(x, n):
    return jax.lax.shift_right_logical(x, jnp.int32(n))


def mix32(h):
    """murmur3 fmix32: full-avalanche 32-bit finalizer."""
    h = h ^ _shr(h, 16)
    h = h * jnp.int32(_C1)
    h = h ^ _shr(h, 13)
    h = h * jnp.int32(_C2)
    h = h ^ _shr(h, 16)
    return h


def counter_bits(seed, timestep, tag, salt=0):
    """Independent 32-bit words keyed by (seed, timestep, tag, salt).

    ``tag`` may be any int32 array (slot-shaped); seed/timestep/salt are
    scalars (python ints or traced int32).  Two chained finalizers with
    distinct lane constants decorrelate consecutive tags/steps."""
    s = jnp.asarray(seed, jnp.int32)
    t = jnp.asarray(timestep, jnp.int32)
    a = jnp.asarray(salt, jnp.int32)
    key = mix32(s * jnp.int32(_PHI) + t) ^ (a * jnp.int32(_C2))
    h = mix32(jnp.asarray(tag, jnp.int32) * jnp.int32(_PHI) + key)
    return mix32(h ^ key)


def uniform_pm1(seed, timestep, tag, salt=0):
    """Uniform in [-1, 1) from the (seed, timestep, tag, salt) counter.

    24 high bits -> f32 mantissa-exact in [0, 2) -> shift to [-1, 1):
    the float conversion is exact on every backend."""
    b = counter_bits(seed, timestep, tag, salt)
    u24 = _shr(b, 8)                       # [0, 2^24)
    return u24.astype(jnp.float32) * jnp.float32(2.0 ** -23) \
        - jnp.float32(1.0)


def uniform3_pm1(seed, timestep, tag):
    """(..., 3) uniform[-1,1) vector per tag — the Langevin noise shape
    (reference md/TwoStepLangevin.cc draws 3 Saru uniforms/particle)."""
    return jnp.stack([uniform_pm1(seed, timestep, tag, salt=ax)
                      for ax in (1, 2, 3)], axis=-1)
