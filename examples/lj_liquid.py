"""The reference README example (README.md:71-90), runnable as-is."""
import hoomd_tpu as hoomd
from hoomd_tpu import md

hoomd.context.initialize("")
hoomd.init.create_lattice(unitcell=hoomd.lattice.sc(a=2.0), n=10)
nl = md.nlist.cell()
lj = md.pair.lj(r_cut=2.5, nlist=nl)
lj.pair_coeff.set('A', 'A', epsilon=1.0, sigma=1.0)
md.integrate.mode_standard(dt=0.005)
md.integrate.langevin(group=hoomd.group.all(), kT=0.2, seed=42)
hoomd.analyze.log(filename="log-output.log",
                  quantities=['potential_energy', 'temperature'],
                  period=100, overwrite=True)
hoomd.dump.gsd("trajectory.htpf", period=2000, overwrite=True)
hoomd.run(10_000)
