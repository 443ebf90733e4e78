"""Scene loader tests against the three checked-in scenes.

Golden facts from the reference assets (SURVEY §2/§7): cornell_box has 9
objects (6 planes, 3 spheres, light = object 8); cubes has two rotated
cubes -> 24 triangles; flying_unicorn's OBJ has 18,728 vertices and
37,380 triangles.
"""

import math
import os

import numpy as np
import pytest

from raytracer_tpu.models import obj as objlib
from raytracer_tpu.models.loader import SceneLoadError, load_scene, load_scene_dict
from raytracer_tpu.models.scene import (
    BRDF_DIFFUSE,
    BRDF_PHONG,
    BRDF_SPECULAR,
    LIGHT_SPHERE,
)

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


def test_cornell_box_inventory():
    s = load_scene(os.path.join(SCENES, "cornell_box.toml"))
    assert s.n_objects == 9
    assert s.n_planes == 6
    assert s.n_spheres == 3
    assert s.n_triangles == 0
    assert s.light_idx == 8  # first (only) emissive object
    assert s.light_type == LIGHT_SPHERE
    np.testing.assert_allclose(np.asarray(s.cam_pos), [50, 52, 295.6], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.cam_dir), [0, -0.042612, -1.0], rtol=1e-6)
    # light sphere: pos (50,70,100) r 4, area 4 pi r^2
    np.testing.assert_allclose(np.asarray(s.light_sph_pos), [50, 70, 100], rtol=1e-6)
    np.testing.assert_allclose(float(s.light_sph_r), 4.0)
    np.testing.assert_allclose(float(s.light_area), 4 * math.pi * 16, rtol=1e-6)
    # brdf types: diffuse walls + diffuse ball, specular ball at index 7
    assert int(s.brdf_type[7]) == BRDF_SPECULAR
    assert int(s.brdf_type[6]) == BRDF_DIFFUSE
    np.testing.assert_allclose(np.asarray(s.c_s[7]), [0.999] * 3, rtol=1e-6)


def test_cubes_rotated_cubes():
    s = load_scene(os.path.join(SCENES, "cubes.toml"))
    assert s.n_objects == 9
    assert s.n_triangles == 24  # 2 cubes x 12 tris
    assert not s.use_bvh  # cube/prism triangles stay brute-forced
    # cube 1 is rotated about its bbox center by rotate_y 0.5: vertices no
    # longer axis aligned but the center is preserved
    tris = np.stack(
        [np.asarray(s.tri_a[:12]), np.asarray(s.tri_b[:12]), np.asarray(s.tri_c[:12])]
    ).reshape(-1, 3)
    center = (tris.min(axis=0) + tris.max(axis=0)) / 2
    np.testing.assert_allclose(center, [15.5 + 14, 14, 33.5 + 14], atol=1e-3)
    # rotation preserved edge lengths: cube diagonal extent = s*sqrt(2) in xz
    ext = tris.max(axis=0) - tris.min(axis=0)
    np.testing.assert_allclose(ext[1], 28.0, atol=1e-3)  # y unchanged by rotate_y


def test_flying_unicorn_mesh_and_bvh():
    s = load_scene(os.path.join(SCENES, "flying_unicorn.toml"))
    # golden count from the OBJ: 37,380 real triangles (the batch also
    # contains degenerate BVH leaf-alignment padding, marked invalid)
    assert int(np.asarray(s.tri_valid).sum()) == 37380
    assert s.n_triangles % 4 == 0
    assert s.use_bvh
    assert s.bvh_tri_start == 0  # no cube/prism objects in this scene
    # A real tree over 37,380 tris: at least ~2*ceil(F/MAX_LEAF)-1 nodes
    # (tight only when every leaf is full; 719 at MAX_LEAF=128/C_LEAF=3).
    assert s.bvh_lo.shape[0] > 500
    # skip links are monotonically bounded: skip[i] in (i, n_nodes]
    skip = np.asarray(s.bvh_skip)
    n = skip.shape[0]
    assert (skip > np.arange(n)).all() and (skip <= n).all()
    # light is the sphere (last object)
    assert s.light_type == LIGHT_SPHERE
    np.testing.assert_allclose(float(s.light_sph_r), 4.0)


def test_obj_parser_semantics():
    v, vn, idx = objlib.parse_obj(
        """
v 0 0 0
v 1 0 0
v 0 1 0
vn 0 0 1
f 1/1/1 2/2/1 3/3/1
"""
    )
    assert v.shape == (3, 3)
    assert vn.shape == (1, 3)
    np.testing.assert_array_equal(idx, [[0, 1, 2]])  # 1-based -> 0-based


def test_obj_parser_errors():
    with pytest.raises(objlib.MeshLoadError):
        objlib.parse_obj("v 1 2")  # truncated vertex
    with pytest.raises(objlib.MeshLoadError):
        objlib.parse_obj("f 1 2")  # face with < 3 verts
    with pytest.raises(objlib.MeshLoadError):
        objlib.parse_obj("v 0 0 0\nf 1 2 9")  # index out of range


def test_prism_triangulation():
    verts, idx = objlib.prism(np.zeros(3), 2.0, 3.0, 4.0)
    assert verts.shape == (8, 3)
    assert idx.shape == (12, 3)
    np.testing.assert_allclose(verts.max(axis=0), [2, 3, 4])
    # every vertex participates
    assert set(idx.reshape(-1).tolist()) == set(range(8))


def test_transforms_order_matters():
    base = {
        "camera": {"pos": [0, 0, 0], "dir": [0, 0, -1]},
        "objects": [
            {
                "emitted": [1, 1, 1],
                "brdf": {"type": "diffuse", "kd": [0, 0, 0]},
                "geometry": {"type": "sphere", "pos": [0, 0, 0], "r": 1},
            },
            {
                "brdf": {"type": "diffuse", "kd": [1, 1, 1]},
                "geometry": {"type": "cube", "pos": [0, 0, 0], "size": 2.0},
                "transforms": [{"translate": [10, 0, 0]}, {"scale": 2.0}],
            },
        ],
    }
    s = load_scene_dict(base, name="t1")
    tris = np.concatenate(
        [np.asarray(s.tri_a[:12]), np.asarray(s.tri_b[:12]), np.asarray(s.tri_c[:12])]
    )
    # translate then scale-about-center: center (11,1,1), half-extent 2
    np.testing.assert_allclose(tris.min(axis=0), [9, -1, -1], atol=1e-5)
    np.testing.assert_allclose(tris.max(axis=0), [13, 3, 3], atol=1e-5)


def test_sphere_transforms():
    s = load_scene_dict(
        {
            "camera": {"pos": [0, 0, 0], "dir": [0, 0, -1]},
            "objects": [
                {
                    "emitted": [1, 1, 1],
                    "brdf": {"type": "diffuse", "kd": [0, 0, 0]},
                    "geometry": {"type": "sphere", "pos": [1, 2, 3], "r": 2},
                    # rotations are no-ops for spheres (src/geometry.rs:447);
                    # scale multiplies r; translate moves pos
                    "transforms": [{"rotate_x": 1.0}, {"scale": 3.0}, {"translate": [1, 1, 1]}],
                }
            ],
        },
        name="t2",
    )
    np.testing.assert_allclose(np.asarray(s.sph_pos[0]), [2, 3, 4], rtol=1e-6)
    np.testing.assert_allclose(float(s.sph_r[0]), 6.0)


def test_phong_material_loads():
    s = load_scene_dict(
        {
            "camera": {"pos": [0, 0, 0], "dir": [0, 0, -1]},
            "objects": [
                {
                    "emitted": [1, 1, 1],
                    "brdf": {
                        "type": "phong",
                        "kd": 0.6,
                        "ks": 0.3,
                        "color_d": [1, 0, 0],
                        "color_s": [1, 1, 1],
                        "power": 10,
                    },
                    "geometry": {"type": "sphere", "pos": [0, 0, -5], "r": 1},
                }
            ],
        },
        name="t3",
    )
    assert int(s.brdf_type[0]) == BRDF_PHONG
    assert float(s.k_d[0]) == pytest.approx(0.6)
    assert float(s.phong_power[0]) == 10.0


def test_unknown_geometry_raises():
    with pytest.raises(SceneLoadError):
        load_scene_dict(
            {
                "camera": {"pos": [0, 0, 0], "dir": [0, 0, -1]},
                "objects": [
                    {"brdf": {"type": "diffuse", "kd": [1, 1, 1]}, "geometry": {"type": "torus"}}
                ],
            },
            name="bad",
        )


def test_native_obj_parser_parity(tmp_path):
    """The C++ parser (native/rt_native.cpp) must match parse_obj semantics,
    including leading-whitespace tolerance and face-index bounds checks."""
    from raytracer_tpu.utils import native

    if native._lib() is None:
        pytest.skip("librt_native.so not built")

    text = """
v 0 0 0
  v 1 0 0
\tv 0 1 0
vn 0 0 1
  f 1/1/1 2/2/1 3/3/1
f 3 2 1
"""
    p = tmp_path / "ws.obj"
    p.write_text(text)
    got = native.parse_obj_file(str(p))
    assert got is not None
    v, vn, idx = got
    ev, evn, eidx = objlib.parse_obj(text)
    np.testing.assert_array_equal(v, ev)
    np.testing.assert_array_equal(vn, evn)
    np.testing.assert_array_equal(idx, eidx)

    bad = tmp_path / "bad.obj"
    bad.write_text("v 0 0 0\nf 1 2 9\n")
    with pytest.raises(objlib.MeshLoadError):
        native.parse_obj_file(str(bad))


def test_native_obj_parser_parity_crewmate():
    """Native vs python parse equality on a real checked-in mesh asset
    (crewmate.obj: 1,708 v / 3,412 f — reference scenes/assets/)."""
    from raytracer_tpu.utils import native

    if native._lib() is None:
        pytest.skip("librt_native.so not built")
    path = os.path.join(SCENES, "assets", "crewmate.obj")
    got = native.parse_obj_file(path)
    assert got is not None
    v, vn, idx = got
    with open(path) as fh:
        ev, evn, eidx = objlib.parse_obj(fh.read())
    assert idx.shape == (3412, 3)
    np.testing.assert_array_equal(v, ev)
    np.testing.assert_array_equal(vn, evn)
    np.testing.assert_array_equal(idx, eidx)
