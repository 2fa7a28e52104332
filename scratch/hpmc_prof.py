"""Time isolated pieces of the HPMC sub_sweep at N=4096 cubes."""
import time
import numpy as np
import jax, jax.numpy as jnp

import hoomd_tpu as hoomd
from hoomd_tpu import hpmc
from hoomd_tpu.ops import cells as cells_ops

hoomd.context.initialize("--notice-level=0")
phi = 0.4
a = (1.0 / phi) ** (1.0 / 3.0)
hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=16)
system = hoomd.context.current.system
N = system.state.N
mc = hpmc.integrate.convex_polyhedron(seed=11, d=0.15, a=0.2)
verts = 0.5 * np.array([[sx, sy, sz] for sx in (-1, 1)
                        for sy in (-1, 1) for sz in (-1, 1)])
mc.shape_param.set('A', vertices=verts)
system.run(5, quiet=True)
prog = system._program
state = system.state

# grab the internals the program was built with
cell_dim = prog.get('cell_dim')
cell_cap = prog.get('cell_cap')
print("program keys:", [k for k in prog.keys()])
print("cell_dim", cell_dim, "cell_cap", cell_cap)

def timeit(f, *args, reps=20):
    r = f(*args); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps

if cell_dim is not None:
    binf = jax.jit(lambda pos, box: cells_ops.bin_particles(pos, box, cell_dim, cell_cap))
    t = timeit(binf, state.pos, state.box)
    print(f"bin_particles: {t*1e3:.3f} ms")

# full sweep
sweep = prog['run_chunk']
c = prog['init_counters']()
t0 = time.perf_counter()
r = sweep(state, c, 10); jax.block_until_ready(r[0].pos)
print(f"10 sweeps: {(time.perf_counter()-t0):.3f} s (incl nothing, compiled already)")
