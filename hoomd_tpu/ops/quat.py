"""Quaternion algebra and rigid-rotor integration.

Vectorized equivalents of the reference's VectorMath.h quaternion helpers
and the NO_SQUISH symplectic free-rotor splitting used by every aniso
integrator (md/TwoStepNVE.cc:295-380, TwoStepLangevin.cc:135-225; Miller et
al. J.Chem.Phys. 116, 8649 (2002)).

Conventions match the reference: orientation quaternion q (w, x, y, z);
conjugate angular momentum quaternion p with s = (1/2) conj(q) p giving
(0, I omega_body).
"""

from __future__ import annotations

import jax.numpy as jnp


def multiply(a, b):
    """Hamilton product, (...,4) x (...,4) -> (...,4)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q, v):
    """Rotate vectors v (...,3) by quaternions q (...,4)."""
    qv = q[..., 1:]
    qw = q[..., 0:1]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def from_vector(v):
    """(...,3) -> (...,4) pure quaternion (0, v)."""
    return jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)


def normalize(q):
    return q / jnp.maximum(
        jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def _permute1(p):
    """(-px, pw, pz, -py): right-multiplication by the x basis quat."""
    return jnp.stack([-p[..., 1], p[..., 0], p[..., 3], -p[..., 2]],
                     axis=-1)


def _permute2(p):
    """(-py, -pz, pw, px)."""
    return jnp.stack([-p[..., 2], -p[..., 3], p[..., 0], p[..., 1]],
                     axis=-1)


def _permute3(p):
    """(-pz, py, -px, pw)."""
    return jnp.stack([-p[..., 3], p[..., 2], -p[..., 1], p[..., 0]],
                     axis=-1)


_PERMS = {1: _permute1, 2: _permute2, 3: _permute3}


def _rotor_axis(q, p, I_k, h, axis):
    perm = _PERMS[axis]
    pk = perm(p)
    qk = perm(q)
    ok = I_k > 1e-12
    phi = jnp.where(ok, 0.25 / jnp.where(ok, I_k, 1.0)
                    * jnp.sum(p * qk, axis=-1), 0.0)
    c = jnp.cos(0.5 * h * phi)[..., None]
    s = jnp.sin(0.5 * h * phi)[..., None]
    okb = ok[..., None]
    p_new = jnp.where(okb, c * p + s * pk, p)
    q_new = jnp.where(okb, c * q + s * qk, q)
    return q_new, p_new


def free_rotor(q, p, inertia, dt):
    """NO_SQUISH Trotter factorization: phi3(dt/2) phi2(dt/2) phi1(dt)
    phi2(dt/2) phi3(dt/2) — exactly the reference's update sequence."""
    Ix, Iy, Iz = inertia[..., 0], inertia[..., 1], inertia[..., 2]
    q, p = _rotor_axis(q, p, Iz, dt, 3)
    q, p = _rotor_axis(q, p, Iy, dt, 2)
    q, p = _rotor_axis(q, p, Ix, 2.0 * dt, 1)
    q, p = _rotor_axis(q, p, Iy, dt, 2)
    q, p = _rotor_axis(q, p, Iz, dt, 3)
    return normalize(q), p


def angmom_kick(q, p, torque_space, inertia, dt):
    """p += dt * q (0, torque_body), torque components along zero-inertia
    axes dropped (reference TwoStepNVE.cc:311-330)."""
    t_body = rotate(conjugate(q), torque_space)
    t_body = jnp.where(inertia > 1e-12, t_body, 0.0)
    return p + dt * multiply(q, from_vector(t_body))


def angular_velocity_body(q, p, inertia):
    """omega in the body frame: s = (1/2) conj(q) p -> I omega."""
    s = 0.5 * multiply(conjugate(q), p)[..., 1:]
    ok = inertia > 1e-12
    return jnp.where(ok, s / jnp.where(ok, inertia, 1.0), 0.0)


def rotational_ke(q, p, inertia):
    """(N,) rotational kinetic energy (ComputeThermo rotational part)."""
    w = angular_velocity_body(q, p, inertia)
    return 0.5 * jnp.sum(inertia * w * w, axis=-1)
