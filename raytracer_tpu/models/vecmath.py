"""Batched 3-vector math on ``[..., 3]`` jnp arrays — plus SoA helpers.

The reference implements a scalar ``Vec3`` with operator overloads
(/root/reference/src/geometry.rs:21-369).  On TPU every operation is instead
batched; two layouts coexist:

- **[..., 3] arrays** (the main API): vectors are ``f32[..., 3]``, scalars
  broadcast with ``[..., None]``.  This is the integrator/engine layout —
  XLA's fusion+layout passes handle the size-3 minor axis well INSIDE a
  fused loop (an experiment converting the whole streaming engine to
  component tuples measured 2.7x SLOWER on cornell_box — see
  BENCHMARKS.md round-3 dead ends).
- **component tuples ``(x, y, z)`` of [N] arrays** (the ``*3`` helpers
  below): used inside the intersection kernels and sort-key code, where
  standalone [N,3] slices/stacks at jit boundaries are measured cross-lane
  relayouts.  ``as3``/``stack3`` convert at the boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

# --- SoA component-tuple helpers ([N]-vector triples) ---

V3 = tuple[Array, Array, Array]


def as3(v) -> V3:
    """[..., 3] array (or already-a-tuple) -> component tuple."""
    if isinstance(v, (tuple, list)):
        return tuple(v)
    return (v[..., 0], v[..., 1], v[..., 2])


def stack3(v: V3) -> Array:
    """Component tuple -> [..., 3] array (boundary use only)."""
    return jnp.stack(tuple(v), axis=-1)


def dot3(a: V3, b: V3) -> Array:
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def sub3(a: V3, b: V3) -> V3:
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def scale3(a: V3, s: Array) -> V3:
    return (a[0] * s, a[1] * s, a[2] * s)


def where3(m: Array, a, b) -> V3:
    """Per-lane select between component tuples (scalars broadcast)."""
    ax = a if isinstance(a, (tuple, list)) else (a, a, a)
    bx = b if isinstance(b, (tuple, list)) else (b, b, b)
    return tuple(jnp.where(m, ax[k], bx[k]) for k in range(3))


def add3(a: V3, b: V3) -> V3:
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def mul3(a: V3, b: V3) -> V3:
    """Hadamard product (Vec3::mult, src/geometry.rs)."""
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def cross3(a: V3, b: V3) -> V3:
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def normalize3(v: V3, eps: float = 0.0) -> V3:
    """Unit vector via rsqrt; ``eps`` floors |v|^2 when nonzero."""
    n2 = dot3(v, v)
    if eps:
        n2 = jnp.maximum(n2, eps)
    return scale3(v, jax.lax.rsqrt(n2))


def norm2_3(a: V3) -> Array:
    return dot3(a, a)


def neg3(a: V3) -> V3:
    return (-a[0], -a[1], -a[2])


def reflect3(v: V3, n: V3) -> V3:
    """Component-tuple ``flip_across`` (see ``reflect``): 2(v.n)n - v."""
    d2 = 2.0 * dot3(v, n)
    return (d2 * n[0] - v[0], d2 * n[1] - v[1], d2 * n[2] - v[2])


def local_frame3(n: V3) -> tuple[V3, V3, V3]:
    """Component-tuple ``local_frame`` (reference create_local_coord,
    src/scene.rs:112-123): helper axis Y if |n.x|>0.1 else X, u = helper x n
    normalized, v = n x u.

    All intermediates are [N] lane-dense scalars — the [N,3] form's cross +
    normalize reduce at 3/128 lane occupancy (the shading core's measured
    reduce-fusion cost, BENCHMARKS.md round-4 cornell trace)."""
    use_y = jnp.abs(n[0]) > 0.1
    hx = jnp.where(use_y, 0.0, 1.0)
    hy = jnp.where(use_y, 1.0, 0.0)
    # helper = (hx, hy, 0); cross(helper, n) with hz=0 simplifies.
    cx = hy * n[2]
    cy = -hx * n[2]
    cz = hx * n[1] - hy * n[0]
    inv = jax.lax.rsqrt(cx * cx + cy * cy + cz * cz)
    u = (cx * inv, cy * inv, cz * inv)
    v = cross3(n, u)
    return u, v, n


def from_local3(u: V3, v: V3, w: V3, dx: Array, dy: Array, dz: Array) -> V3:
    """Rotate a local-frame direction (dx,dy,dz components) into world."""
    return tuple(u[k] * dx + v[k] * dy + w[k] * dz for k in range(3))


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
