"""smallpt-style camera: ray generation with tent-filter jitter.

Reference: ``sample_pixel`` (/root/reference/src/server.rs:320-364).
cx = (0.5135*w/h, 0, 0); cy = norm(cx x dir) * 0.5135; each pixel is a 2x2
subpixel grid; jitter is the tent filter dx = sqrt(r)-1 / 1-sqrt(2-r).
The camera dir from the scene file is used UNNORMALIZED in the sum (the
reference never normalizes it) and the final ray direction is normalized.

Y convention: the reference renders row ``height-y-1`` but labels it ``y``
in the wire protocol (src/server.rs:181), i.e. row label 0 is the TOP of
the image.  ``py`` here is the *render-space* row (0 = bottom); callers
flip when assembling images.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from raytracer_tpu.models import vecmath as vm
from raytracer_tpu.models.scene import SceneArrays


def tent_jitter(u: Array) -> Array:
    """Tent filter over [-1,1] from uniform [0,1) (src/server.rs:339-351)."""
    r = 2.0 * u
    return jnp.where(r < 1.0, jnp.sqrt(r) - 1.0, 1.0 - jnp.sqrt(jnp.maximum(2.0 - r, 0.0)))


def camera_basis(scene: SceneArrays, width: int, height: int, fov_scale: float):
    """(cx, cy) image-plane basis vectors (src/server.rs:330-331)."""
    w = jnp.float32(width)
    h = jnp.float32(height)
    cx = jnp.array([fov_scale, 0.0, 0.0], jnp.float32) * (w / h)
    cy = vm.normalize(vm.cross(cx, scene.cam_dir)) * fov_scale
    return cx, cy


def camera_rays3(
    scene: SceneArrays,
    width: int,
    height: int,
    fov_scale: float,
    px: Array,  # [N] pixel column
    py: Array,  # [N] pixel row in RENDER space (0 = bottom)
    sx: Array,  # [N] subpixel column in {0,1}
    sy: Array,  # [N] subpixel row in {0,1}
    u1: Array,  # [N] uniform for dx
    u2: Array,  # [N] uniform for dy
) -> tuple[vm.V3, vm.V3]:
    """Generate N camera rays in SoA form -> (ro=(x,y,z), rd=(x,y,z)).

    The hot math runs per COMPONENT on [N] vectors: [N,3] elementwise ops
    place the 3-axis on the 128-wide lane dimension (3/128 vreg occupancy)
    and measured 8.2 ms at 540k lanes; the component form is ~40x denser
    and returning components avoids the [N]->[N,3] interleave relayout.
    """
    w = jnp.float32(width)
    h = jnp.float32(height)
    cx, cy = camera_basis(scene, width, height, fov_scale)
    dx = tent_jitter(u1)
    dy = tent_jitter(u2)
    fx = ((sx + 0.5 + dx) / 2.0 + px) / w - 0.5
    fy = ((sy + 0.5 + dy) / 2.0 + py) / h - 0.5
    d = [cx[k] * fx + cy[k] * fy + scene.cam_dir[k] for k in range(3)]
    inv = 1.0 / jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
    rd = tuple(d[k] * inv for k in range(3))
    ro = tuple(jnp.broadcast_to(scene.cam_pos[k], rd[0].shape) for k in range(3))
    return ro, rd


def camera_rays(
    scene: SceneArrays,
    width: int,
    height: int,
    fov_scale: float,
    px: Array, py: Array, sx: Array, sy: Array, u1: Array, u2: Array,
) -> tuple[Array, Array]:
    """Array-layout wrapper over ``camera_rays3`` (cold/tool paths)."""
    ro, rd = camera_rays3(
        scene, width, height, fov_scale, px, py, sx, sy, u1, u2
    )
    return vm.stack3(ro), vm.stack3(rd)
