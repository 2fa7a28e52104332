"""Rebuild-cost probe: the production 12-operand lax.sort vs
argsort + wide row-gather alternatives, on the real TPU."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

M = 94080          # nc * C at the 64k bench point
NCOLS = 15
nc, C = 2352, 40

key = jax.random.PRNGKey(0)
cid = jax.random.randint(key, (M,), 0, nc + 1, jnp.int32)
payload = jax.random.normal(key, (M, NCOLS), jnp.float32)
cols32 = [payload[:, i] for i in range(NCOLS)]


def bc(a):
    return jax.lax.bitcast_convert_type(a, jnp.float32)


@jax.jit
def sort_wide(cid, *cols):
    s = jax.lax.sort((bc(cid),) + cols, num_keys=1)
    return s[1]


@jax.jit
def sort_iota_carry(cid, payload):
    # sort (key, iota) then ONE row gather of the (M, NCOLS) payload
    idx = jnp.arange(M, dtype=jnp.int32)
    _, order = jax.lax.sort((cid, idx), num_keys=1)
    return jnp.take(payload, order, axis=0)


@jax.jit
def sort_argsort_gather_cols(cid, *cols):
    order = jnp.argsort(cid)
    return tuple(c[order] for c in cols)


def t(fn, *args, label="", reps=20):
    o = fn(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label:30s} {dt:7.3f} ms", flush=True)


t(sort_wide, cid, *cols32, label="15-operand lax.sort")
t(sort_iota_carry, cid, payload, label="argsort + (M,15) row gather")
t(sort_argsort_gather_cols, cid, *cols32,
  label="argsort + 15 column gathers")
