"""Batched 3-vector math on ``[..., 3]`` jnp arrays.

The reference implements a scalar ``Vec3`` with operator overloads
(/root/reference/src/geometry.rs:21-369).  On TPU every operation is instead
batched over a trailing axis of size 3 so the VPU sees dense lanes; there is
no Vec3 object, just conventions:

- vectors are ``f32[..., 3]``
- scalars broadcast with ``[..., None]``
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def dot(a: Array, b: Array) -> Array:
    """Row-wise dot product -> ``[...]``."""
    return jnp.sum(a * b, axis=-1)


def cross(a: Array, b: Array) -> Array:
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def norm2(a: Array) -> Array:
    return jnp.sum(a * a, axis=-1)


def length(a: Array) -> Array:
    return jnp.sqrt(norm2(a))


def normalize(a: Array, eps: float = 0.0) -> Array:
    """Unit vector.  With ``eps=0`` matches the reference's ``norm`` (no
    guard, src/geometry.rs:61-63); pass a small eps to guard degenerate input.
    """
    n2 = norm2(a)
    if eps:
        n2 = jnp.maximum(n2, eps)
    return a * jnp.float32(1.0) / jnp.sqrt(n2)[..., None]


def reflect(v: Array, n: Array) -> Array:
    """``flip_across``: mirror v across axis n (src/geometry.rs:99-101).

    Note this is 2(v.n)n - v — the reflection of the *outgoing* convention
    (returns a vector on the same side), not the ray-dir flip.
    """
    return 2.0 * dot(v, n)[..., None] * n - v


def hadamard(a: Array, b: Array) -> Array:
    return a * b


def face_forward(n: Array, toward: Array) -> Array:
    """Flip n so it points into the hemisphere of ``toward``.

    Matches the reference's two-sided normal logic ``if n.dot(-dir) >= 0``
    (src/geometry.rs:532, :558, :660): n is kept when n.toward >= 0.
    """
    keep = dot(n, toward) >= 0.0
    return jnp.where(keep[..., None], n, -n)


def rotate_x(v: Array, angle: float) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [v[..., 0], v[..., 1] * c - v[..., 2] * s, v[..., 1] * s + v[..., 2] * c],
        axis=-1,
    )


def rotate_y(v: Array, angle: float) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [v[..., 0] * c + v[..., 2] * s, v[..., 1], v[..., 2] * c - v[..., 0] * s],
        axis=-1,
    )


def rotate_z(v: Array, angle: float) -> Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [v[..., 0] * c - v[..., 1] * s, v[..., 0] * s + v[..., 1] * c, v[..., 2]],
        axis=-1,
    )


def from_spherical(inclination: Array, azimuth: Array) -> Array:
    """Unit vector from spherical angles (src/geometry.rs:41-47):
    x = sin(i)cos(a), y = sin(i)sin(a), z = cos(i)."""
    si = jnp.sin(inclination)
    return jnp.stack(
        [si * jnp.cos(azimuth), si * jnp.sin(azimuth), jnp.cos(inclination)],
        axis=-1,
    )


def local_frame(n: Array) -> tuple[Array, Array, Array]:
    """Orthonormal (u, v, w=n) tangent frame.

    Same construction as the reference's ``create_local_coord``
    (src/scene.rs:112-123): pick helper axis Y if |n.x|>0.1 else X,
    u = helper x n normalized, v = n x u.
    """
    use_y = jnp.abs(n[..., 0]) > 0.1
    helper = jnp.where(
        use_y[..., None],
        jnp.array([0.0, 1.0, 0.0], dtype=n.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=n.dtype),
    )
    u = normalize(cross(helper, n))
    v = cross(n, u)
    return u, v, n


def from_local(u: Array, v: Array, w: Array, d: Array) -> Array:
    """Rotate a local-frame direction ``d=[...,3]`` into world space."""
    return (
        u * d[..., 0:1] + v * d[..., 1:2] + w * d[..., 2:3]
    )
