"""Phong + triangle estimates vs the independent f64 oracle.

Round-1 verdict: the oracle covered spheres/planes + diffuse/specular only,
so Phong and mesh estimates were checked engine-vs-engine but never against
an independent implementation.  This scene hands the SAME explicit
geometry (planes + a 2-triangle Phong quad + a Phong sphere + the light)
to build_scene_arrays and to the oracle, and compares per-pixel mean
radiance within Monte-Carlo error.

The oracle deliberately uses a DIFFERENT estimator for Phong continuation
(cosine sampling + (kd+ks) roulette) than the production 3-way lobe
sampler — equal expectations through different estimators is a much
stronger check than replicating the sampler.
"""

from __future__ import annotations

import numpy as np
import pytest

from raytracer_tpu.config import RenderConfig
from raytracer_tpu.models.scene import build_scene_arrays
from tests.oracle import Oracle
from tests.test_integrator import _wavefront_pixel_radiance

CAM_POS = [50.0, 52.0, 295.6]
CAM_DIR = [0.0, -0.042612, -1.0]

QUAD = [
    [[30.0, 0.0, 60.0], [70.0, 0.0, 60.0], [70.0, 40.0, 60.0]],
    [[30.0, 0.0, 60.0], [70.0, 40.0, 60.0], [30.0, 40.0, 60.0]],
]
PHONG_QUAD = dict(kd=0.6, ks=0.3, power=25.0, color_d=[0.55, 0.8, 0.85], color_s=[1.0, 1.0, 1.0])
PHONG_BALL = dict(kd=0.45, ks=0.5, power=80.0, color_d=[0.9, 0.7, 0.3], color_s=[1.0, 1.0, 1.0])

PLANES = [
    dict(pos=[0.0, 0.0, 0.0], n=[0.0, 1.0, 0.0]),  # floor
    dict(pos=[0.0, 0.0, 0.0], n=[0.0, 0.0, -1.0]),  # back
    dict(pos=[1.0, 0.0, 0.0], n=[-1.0, 0.0, 0.0]),  # left
    dict(pos=[99.0, 0.0, 0.0], n=[-1.0, 0.0, 0.0]),  # right
]
WALL_KD = [0.75, 0.75, 0.75]


@pytest.fixture(scope="module")
def phong_scene():
    # Object order: planes (0-3), quad (4), ball (5), light (6).
    materials = [
        dict(emitted=[0, 0, 0], brdf_type=0, c_d=WALL_KD, c_s=[0, 0, 0], k_d=1.0, k_s=0.0, power=0.0)
        for _ in PLANES
    ]
    materials.append(
        dict(emitted=[0, 0, 0], brdf_type=2, c_d=PHONG_QUAD["color_d"], c_s=PHONG_QUAD["color_s"],
             k_d=PHONG_QUAD["kd"], k_s=PHONG_QUAD["ks"], power=PHONG_QUAD["power"])
    )
    materials.append(
        dict(emitted=[0, 0, 0], brdf_type=2, c_d=PHONG_BALL["color_d"], c_s=PHONG_BALL["color_s"],
             k_d=PHONG_BALL["kd"], k_s=PHONG_BALL["ks"], power=PHONG_BALL["power"])
    )
    materials.append(
        dict(emitted=[50, 50, 50], brdf_type=0, c_d=[0, 0, 0], c_s=[0, 0, 0], k_d=1.0, k_s=0.0, power=0.0)
    )
    s = build_scene_arrays(
        "phong_oracle",
        np.asarray(CAM_POS), np.asarray(CAM_DIR),
        spheres=[
            dict(pos=[75.0, 10.0, 85.0], r=10.0, obj=5),
            dict(pos=[50.0, 70.0, 100.0], r=4.0, obj=6),
        ],
        planes=[dict(**p, obj=i) for i, p in enumerate(PLANES)],
        triangles=[dict(a=t[0], b=t[1], c=t[2], obj=4) for t in QUAD],
        materials=materials,
    )

    doc = dict(
        camera=dict(pos=CAM_POS, dir=CAM_DIR),
        objects=[
            *[dict(brdf=dict(type="diffuse", kd=WALL_KD), geometry=dict(type="plane", **p)) for p in PLANES],
            dict(brdf=dict(type="phong", **PHONG_QUAD), geometry=dict(type="triangles", tris=QUAD)),
            dict(brdf=dict(type="phong", **PHONG_BALL), geometry=dict(type="sphere", pos=[75.0, 10.0, 85.0], r=10.0)),
            dict(emitted=[50, 50, 50], brdf=dict(type="diffuse", kd=[0, 0, 0]),
                 geometry=dict(type="sphere", pos=[50.0, 70.0, 100.0], r=4.0)),
        ],
    )
    return s, doc


@pytest.mark.parametrize("px,py", [(300, 150), (404, 87), (150, 60)])
def test_phong_matches_oracle(phong_scene, px, py):
    """Phong quad / Phong sphere / floor pixels agree with the oracle."""
    s, doc = phong_scene
    cfg = RenderConfig()
    n = 2048
    ours = _wavefront_pixel_radiance(s, cfg, px, py, n)
    ours_mean = ours.mean(axis=0)
    ours_sem = ours.std(axis=0) / np.sqrt(n)

    oracle = Oracle(doc, np.random.default_rng(321))
    n_oracle = 384
    acc = np.zeros((n_oracle, 3))
    w, h = float(cfg.width), float(cfg.height)
    cx = np.asarray([0.5135 * w / h, 0.0, 0.0])
    cam_dir = np.asarray(CAM_DIR, float)
    cy = np.cross(cx, cam_dir)
    cy = cy / np.linalg.norm(cy) * 0.5135
    rng = oracle.rng
    for k in range(n_oracle):
        fx = (0.5 + px + rng.uniform(-0.5, 0.5)) / w - 0.5
        fy = (0.5 + py + rng.uniform(-0.5, 0.5)) / h - 0.5
        d = cx * fx + cy * fy + cam_dir
        acc[k] = oracle.received(np.asarray(CAM_POS, float), d / np.linalg.norm(d))
    o_mean = acc.mean(axis=0)
    o_sem = acc.std(axis=0) / np.sqrt(n_oracle)

    sem = np.sqrt(ours_sem**2 + o_sem**2)
    diff = np.abs(ours_mean - o_mean)
    assert (diff < 4.5 * sem + 0.02).all(), (
        f"pixel ({px},{py}): ours {ours_mean} vs oracle {o_mean} sem {sem}"
    )
