"""HPMC throughput vs N on the real chip (cubes, phi=0.4)."""
import time, json, sys
import numpy as np

def run_one(n_side):
    import hoomd_tpu as hoomd
    from hoomd_tpu import hpmc
    hoomd.context.initialize("--notice-level=0")
    phi = 0.4
    a = (1.0 / phi) ** (1.0 / 3.0)
    hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=a), n=n_side)
    system = hoomd.context.current.system
    N = system.state.N
    mc = hpmc.integrate.convex_polyhedron(seed=11, d=0.15, a=0.2)
    verts = 0.5 * np.array([[sx, sy, sz] for sx in (-1, 1)
                            for sy in (-1, 1) for sz in (-1, 1)])
    mc.shape_param.set('A', vertices=verts)
    system.run(20, quiet=True)
    c0 = mc.get_counters()
    t0 = time.perf_counter()
    system.run(50, quiet=True)
    el = time.perf_counter() - t0
    c1 = mc.get_counters()
    moves = sum(int(c1[k]) - int(c0[k]) for k in (
        'translate_accept', 'translate_reject', 'rotate_accept', 'rotate_reject'))
    print(f"N={N}: {moves/el/1e3:.1f}k moves/s  ({el/50*1e3:.1f} ms/sweep, {moves} moves)")

run_one(int(sys.argv[1]))
