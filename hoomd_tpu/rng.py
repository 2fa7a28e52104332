"""Counter-based random streams for stochastic integrators/thermostats.

The reference uses the Saru counter-based PRNG keyed by
(seed, particle tag, timestep) so every particle gets an independent,
reproducible stream with no global state (hoomd/Saru.h:51-121; usage
md/TwoStepLangevin.cc:40-43).  JAX's threefry counter-based PRNG is the
native equivalent; we keep the reference's *seeding discipline* — one stream
per (user seed, timestep), indexed by tag — not its bit stream.

Indexing generated rows by tag (not slot) makes draws invariant under
spatial re-sorting, preserving the reference's determinism guarantee
(md/test-py/test_deterministic.py semantics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def step_key(seed: int, timestep, salt: int = 0):
    """Key for one (user seed, timestep, consumer) tuple.  ``salt``
    distinguishes consumers (e.g. two Langevin methods with equal seeds)."""
    k = jax.random.key(seed)
    k = jax.random.fold_in(k, salt)
    return jax.random.fold_in(k, timestep)


def normal_by_tag(key, tag, shape_per_tag, dtype):
    """(len(tag), *shape_per_tag) standard normals, row t drawn from the
    tag-t substream: invariant to particle ordering."""
    n_tags = tag.shape[0]
    draws = jax.random.normal(key, (n_tags,) + shape_per_tag, dtype=dtype)
    return draws[tag]


def uniform_by_tag(key, tag, shape_per_tag, dtype, lo=-1.0, hi=1.0):
    n_tags = tag.shape[0]
    draws = jax.random.uniform(key, (n_tags,) + shape_per_tag, dtype=dtype,
                               minval=lo, maxval=hi)
    return draws[tag]
