"""Probe raw VPU throughput: chained fma on a VMEM-resident tile.

Establishes the ops/s ceiling so we know how far the stencil kernel is
from speed-of-light, and whether bf16 doubles VPU rate on this chip.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def make(K, dtype, shape=(256, 512)):
    def kernel(x_ref, o_ref):
        def body(_, x):
            # 8 independent fma chains to expose ILP
            a = x * 1.000001 + 0.000001
            b = x * 0.999999 - 0.000001
            c = x * 1.000002 + 0.000002
            d = x * 0.999998 - 0.000002
            return (a + b) * 0.5 + (c + d) * 0.25 - x * 0.25
        o_ref[...] = jax.lax.fori_loop(0, K, body, x_ref[...])
    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    return run

def probe(dtype, K=2000, shape=(256, 512)):
    x = jnp.ones(shape, dtype) * 0.5
    run = make(K, dtype, shape)
    o = run(x); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = run(x)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 10
    # ops per body: 4 fma-ish muls+4 adds... count macro ops: 4*(mul+add)=8 + 3 = 11
    ops = shape[0] * shape[1] * K * 11
    print(f"{dtype.__name__:9s} {dt*1e3:8.3f} ms  {ops/dt/1e12:6.2f} Tops/s")

probe(jnp.float32)
probe(jnp.bfloat16)

# dependent chain (no ILP): measures latency-bound rate
def make_dep(K, dtype, shape=(256, 512)):
    def kernel(x_ref, o_ref):
        def body(_, x):
            return x * 1.000001 + 1e-7
        o_ref[...] = jax.lax.fori_loop(0, K, body, x_ref[...])
    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    return run

def probe_dep(dtype, K=2000, shape=(256, 512)):
    x = jnp.ones(shape, dtype) * 0.5
    run = make_dep(K, dtype, shape)
    o = run(x); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(10):
        o = run(x)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / 10
    ops = shape[0] * shape[1] * K  # 1 fma per body
    print(f"dep {dtype.__name__:9s} {dt*1e3:8.3f} ms  {ops/dt/1e12:6.2f} Tfma/s")

probe_dep(jnp.float32)
