"""Isolate SAT overlap cost at production sub_sweep shapes."""
import time
import numpy as np
import jax, jax.numpy as jnp

import hoomd_tpu as hoomd
from hoomd_tpu import hpmc

hoomd.context.initialize("--notice-level=0")
phi = 0.4
a = (1.0 / phi) ** (1.0 / 3.0)
hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=16)
system = hoomd.context.current.system
mc = hpmc.integrate.convex_polyhedron(seed=11, d=0.15, a=0.2)
verts = 0.5 * np.array([[sx, sy, sz] for sx in (-1, 1)
                        for sy in (-1, 1) for sz in (-1, 1)])
mc.shape_param.set('A', vertices=verts)
mc._shape_params_resolved = None
system.hpmc_integrator = mc

fn = mc._make_overlap_fn(system)
M, C = 216, 459
key = jax.random.PRNGKey(0)
dr = jax.random.normal(key, (M, C, 3)) * 2.0
ti = jnp.zeros((M, 1), jnp.int32)
tj = jnp.zeros((M, C), jnp.int32)
qi = jnp.broadcast_to(jnp.asarray([1.,0,0,0]), (M, 4))
qj = jnp.broadcast_to(jnp.asarray([1.,0,0,0]), (M, C, 4))

f = jax.jit(lambda dr: fn(dr, ti, tj, system.state, None, None, q_i=qi, q_j=qj))
r = f(dr); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(50):
    r = f(dr)
jax.block_until_ready(r)
print(f"overlap_fn (M={M},C={C}): {(time.perf_counter()-t0)/50*1e3:.3f} ms")
