"""Runtime-compiled patch energies (reference hoomd/jit/: user C++ strings
compiled with clang/LLVM ORC into HPMC patch energies, jit/PatchEnergyJIT.h,
jit/patch.py:16-227).

On this stack ``jax.jit`` IS the runtime compiler: users supply a plain
Python/JAX function for the pair patch energy and it is traced and compiled
into the Monte Carlo acceptance kernel — strictly more powerful than the
reference's C++-string path (autodiff, vectorization for free), with the
same role in the architecture.
"""

from . import patch

__all__ = ['patch']
