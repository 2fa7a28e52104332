"""HPMC computes (reference hpmc/compute.py, ComputeFreeVolume.h)."""

from __future__ import annotations

import numpy as np

from .. import context


class free_volume:
    """Monte Carlo estimate of the free volume available to a test sphere
    (reference hpmc.compute.free_volume): sample nsample random points,
    count those that do not overlap any particle."""

    def __init__(self, mc, seed, nsample=10000, test_type=None, suffix=''):
        self.mc = mc
        self.seed = int(seed)
        self.nsample = int(nsample)
        self.test_type = test_type

    @property
    def value(self):
        import jax
        import jax.numpy as jnp
        system = context.current.system
        st = system.state
        types = system.particle_types
        diam = np.array([
            float(self.mc.shape_param[t].get('diameter', 1.0))
            for t in types])
        test_d = (diam[types.index(self.test_type)]
                  if self.test_type else 0.0)
        key = jax.random.key(self.seed)
        u = jax.random.uniform(key, (self.nsample, 3),
                               dtype=st.pos.dtype)
        pts = st.box.from_fraction(u)
        d_t = jnp.asarray(diam, st.pos.dtype)
        # brute-force distance check, blocked over samples
        r_need = 0.5 * (d_t[st.typeid] + test_d)   # (N,)

        def blocked(pts_blk):
            dr = st.box.min_image(pts_blk[:, None, :]
                                  - st.pos[None, :, :])
            r2 = jnp.sum(dr * dr, axis=-1)
            return jnp.any(r2 < (r_need[None, :]) ** 2, axis=1)

        B = 2048
        nb = -(-self.nsample // B)
        pad = nb * B - self.nsample
        pts_p = jnp.concatenate(
            [pts, jnp.full((pad, 3), 1e8, st.pos.dtype)])
        hits = jax.lax.map(blocked, pts_p.reshape(nb, B, 3)).reshape(-1)
        frac_free = 1.0 - jnp.sum(hits[:self.nsample]) / self.nsample
        return float(frac_free * st.box.volume())
