"""HPMC patch energies from user functions (reference jit/patch.py user
class, PatchEnergyJIT.h).

    def my_patch(dr, typei, typej, qi, qj, di, dj, qci, qcj):
        r = jnp.linalg.norm(dr, axis=-1)
        return jnp.where(r < 2.0, -1.0, 0.0)

    patch = jit.patch.user(mc=mc, r_cut=2.0, func=my_patch)

The function must be jax-traceable and vectorized over trailing batch
dimensions; it receives the separation vector dr = r_i - r_j, the type ids,
orientation quaternions, diameters and charges of both particles — the same
signature surface the reference exposes to its C++ snippets.  MC moves then
accept with the Metropolis factor exp(-beta dU) on top of the hard-overlap
test.
"""

from __future__ import annotations

from .. import context


class user:
    """Attach a user patch-energy function to an HPMC integrator."""

    def __init__(self, mc, r_cut, func=None, code=None, llvm_ir_file=None,
                 clang_exec=None, array_size=1):
        if func is None:
            raise NotImplementedError(
                "jit.patch.user: pass func= a jax-traceable python "
                "function; C++ `code` strings are a CUDA/LLVM-era "
                "mechanism — jax.jit compiles your python directly")
        self.r_cut = float(r_cut)
        self.func = func
        self.mc = mc
        mc._patch = self
        context.current.system._dirty()

    def disable(self):
        self.mc._patch = None
        context.current.system._dirty()

    def enable(self):
        self.mc._patch = self
        context.current.system._dirty()


class user_union(user):
    """Reference jit.patch.user_union; evaluate the user function over
    constituent points of a union shape.  Not yet implemented."""

    def __init__(self, *a, **k):
        raise NotImplementedError(
            "jit.patch.user_union: not yet implemented")
