"""Probe building blocks for a Pallas local rebin:
A) XLA row-scatter (M,16) by precomputed destination slot
B) in-kernel batched one-hot matmul (nx,C,K)@(nx,K,16)
C) in-kernel cumsum along lanes
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 94080
NCOL = 16

def timeit(label, fn, reps=50):
    o = fn(); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = fn()
    jax.block_until_ready(o)
    print(f"{label:44s} {(time.perf_counter()-t0)/reps*1e3:8.4f} ms",
          flush=True)

rng = np.random.RandomState(0)
payload = jnp.asarray(rng.rand(M, NCOL).astype(np.float32))
dst = jnp.asarray(rng.permutation(M).astype(np.int32))
init = jnp.zeros((M + 1, NCOL), jnp.float32)

@jax.jit
def scat(payload, dst):
    return init.at[dst].set(payload, mode='drop')
timeit("A: XLA row scatter (94080,16)", lambda: scat(payload, dst))

@jax.jit
def gath(payload, dst):
    return payload[dst]
timeit("A2: XLA row gather (94080,16)", lambda: gath(payload, dst))

# B: batched one-hot matmul in pallas
nx, C, K = 12, 40, 1080
oh = jnp.asarray(rng.rand(14, nx, C, K).astype(np.float32))
W = jnp.asarray(rng.rand(14, nx, K, NCOL).astype(np.float32))

def kern_b(oh_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        oh_ref[0], w_ref[0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[None]

@jax.jit
def run_b(oh, W):
    return pl.pallas_call(
        kern_b,
        grid=(14,),
        in_specs=[pl.BlockSpec((1, nx, C, K), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, nx, K, NCOL), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nx, C, NCOL), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((14, nx, C, NCOL), jnp.float32),
    )(oh, W)

try:
    timeit("B: pallas batched onehot matmul x14", lambda: run_b(oh, W))
except Exception as e:
    print("B FAILED:", repr(e)[:300], flush=True)

# C: cumsum along lanes in pallas
X = jnp.asarray(rng.rand(14, nx, C, K).astype(np.float32))

def kern_c(x_ref, o_ref):
    o_ref[...] = jnp.cumsum(x_ref[...], axis=-1)

@jax.jit
def run_c(X):
    return pl.pallas_call(
        kern_c,
        grid=(14,),
        in_specs=[pl.BlockSpec((1, nx, C, K), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nx, C, K), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((14, nx, C, K), jnp.float32),
    )(X)

try:
    timeit("C: pallas cumsum lanes (14,12,40,1080)", lambda: run_c(X))
except Exception as e:
    print("C FAILED:", repr(e)[:300], flush=True)

# C2: cumsum on the smaller (nx, K) shape actually needed
X2 = jnp.asarray(rng.rand(168, nx, K).astype(np.float32))

def kern_c2(x_ref, o_ref):
    o_ref[...] = jnp.cumsum(x_ref[...], axis=-1)

@jax.jit
def run_c2(X2):
    return pl.pallas_call(
        kern_c2,
        grid=(168,),
        in_specs=[pl.BlockSpec((1, nx, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nx, K), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((168, nx, K), jnp.float32),
    )(X2)

try:
    timeit("C2: pallas cumsum lanes (168 rows,12,1080)",
           lambda: run_c2(X2))
except Exception as e:
    print("C2 FAILED:", repr(e)[:300], flush=True)

# D: BIT-exactness of one-hot placement through the MXU (bf16x3 path).
# The local rebin transports pos/vel/frc and int-valued f32 columns
# through onehot @ payload; placement must reproduce the f32 payload
# bit-exactly or the rebin changes trajectories.
K2, CO = 1080, 40
oh_np = np.zeros((CO, K2), np.float32)
sel = rng.choice(K2, CO, replace=False)
for s in range(CO):
    oh_np[s, sel[s]] = 1.0
pay = rng.randn(K2, NCOL).astype(np.float32)
pay[:, 9] = rng.randint(0, 64000, K2)          # tag-like ints
pay[:, 10] = rng.randint(-30, 30, K2)          # img-like ints
ohj = jnp.asarray(oh_np); payj = jnp.asarray(pay)

def kern_d(oh_ref, p_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        oh_ref[...], p_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

@jax.jit
def run_d(oh, p):
    return pl.pallas_call(
        kern_d,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CO, NCOL), jnp.float32),
    )(oh, p)

try:
    got = np.asarray(run_d(ohj, payj))
    want = pay[sel]
    exact = (got.view(np.uint32) == want.view(np.uint32)).all()
    print(f"D: onehot matmul placement bit-exact: {exact} "
          f"(maxabs diff {np.abs(got - want).max():.3e})", flush=True)
except Exception as e:
    print("D FAILED:", repr(e)[:300], flush=True)
