import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp

nc, C = 12*14*14, 40
x = jnp.asarray(np.random.rand(nc, C, 3).astype(np.float32))

@jax.jit
def tr(p, n):
    def body(_, p):
        g = jnp.transpose(p.reshape(14,14,12,C,3), (4,0,1,2,3))
        gt = g[..., None]
        # simulate output transpose too
        F = jnp.transpose(g.reshape(3, nc, C), (1, 2, 0))
        return p + 1e-9*F + 1e-9*gt[...,0].reshape(3,nc,C).transpose(1,2,0)
    return jax.lax.fori_loop(0, n, body, p)

o = tr(x, 50); jax.block_until_ready(o)
t0=time.perf_counter(); o = tr(x, 50); jax.block_until_ready(o)
print("transpose trio per iter", (time.perf_counter()-t0)/50*1e3, "ms")

@jax.jit
def red(p, n):
    def body(_, p):
        ke = jnp.sum(p * p)
        md = jnp.max(jnp.sum(p*p, -1))
        return p * (1.0 + 1e-12*ke + 1e-12*md)
    return jax.lax.fori_loop(0, n, body, p)
o = red(x, 50); jax.block_until_ready(o)
t0=time.perf_counter(); o = red(x, 50); jax.block_until_ready(o)
print("2 reductions + scale per iter", (time.perf_counter()-t0)/50*1e3, "ms")
