"""HPMC analyzers (reference hpmc/AnalyzerSDF.h, hpmc/analyze.py)."""

from __future__ import annotations

import numpy as np

from .. import context
from ..operation import Analyzer


class sdf(Analyzer):
    """Scale distribution function pressure estimator for hard particles
    (reference hpmc.analyze.sdf): histogram s(x) of near-contact pair gaps
    x = r/sigma - 1; betaP = rho (1 + s(0+)/(2*dim)) with s(0+) from a
    linear extrapolation of the first bins."""

    def __init__(self, mc, filename, xmax, dx, navg, period,
                 overwrite=False, phase=0):
        Analyzer.__init__(self, period, phase if phase != -1 else 0)
        self.mc = mc
        self.filename = filename
        self.xmax = float(xmax)
        self.dx = float(dx)
        self.nbins = int(round(self.xmax / self.dx))
        self._hist = np.zeros(self.nbins)
        self._nframes = 0
        if overwrite and filename:
            open(filename, 'w').close()
        context.current.system.register_analyzer(self)

    def analyze(self, system, timestep):
        import jax
        import jax.numpy as jnp
        st = system.state
        types = system.particle_types
        diam = np.array([float(self.mc.shape_param[t].get('diameter', 1.0))
                         for t in types])
        d_t = jnp.asarray(diam, st.pos.dtype)[st.typeid]
        N = st.N
        B = 512
        nb = -(-N // B)
        pad = nb * B - N
        pos_p = jnp.concatenate(
            [st.pos, jnp.full((pad, 3), 1e8, st.pos.dtype)])
        d_p = jnp.concatenate([d_t, jnp.zeros((pad,), st.pos.dtype)])
        rows_all = jnp.arange(nb * B).reshape(nb, B)

        def block(rows):
            dr = st.box.min_image(pos_p[rows][:, None, :]
                                  - st.pos[None, :, :])
            r = jnp.sqrt(jnp.sum(dr * dr, axis=-1))
            sig = 0.5 * (d_p[rows][:, None] + d_t[None, :])
            x = r / sig - 1.0
            ok = (rows[:, None] != jnp.arange(N)[None]) & (x >= 0) \
                & (x < self.xmax)
            bins = jnp.clip((x / self.dx).astype(jnp.int32), 0,
                            self.nbins - 1)
            h = jnp.zeros((self.nbins,), jnp.int32)
            return h.at[jnp.where(ok, bins, 0)].add(
                jnp.where(ok, 1, 0))
        h = np.asarray(jnp.sum(jax.lax.map(block, rows_all), axis=0))
        # ordered-pair counts (each pair twice) — the reference SDF
        # normalization, matching betaP = rho (1 + s(0+)/(2 dim))
        self._hist += h
        self._nframes += 1
        if self.filename:
            with open(self.filename, 'a') as f:
                f.write(str(timestep) + '\t'
                        + '\t'.join(str(v) for v in self.sdf()) + '\n')

    def sdf(self):
        """s(x): normalized histogram (per particle per dx)."""
        sys_ = context.current.system
        N = sys_.state.N
        if self._nframes == 0:
            return np.zeros(self.nbins)
        return self._hist / (self._nframes * N * self.dx)

    def betaP(self):
        """Pressure from linear extrapolation of s(x) to x=0
        (reference SDF pressure formula)."""
        sys_ = context.current.system
        s = self.sdf()
        xs = (np.arange(self.nbins) + 0.5) * self.dx
        k = max(4, self.nbins // 4)
        coef = np.polyfit(xs[:k], s[:k], 1)
        s0 = coef[1]
        rho = sys_.state.N / float(sys_.state.box.volume())
        dim = sys_.state.box.dimensions
        return rho * (1.0 + s0 / (2.0 * dim))
