"""Scene loading tests: OBJ/MTL semantics, light sync, device flattening."""

import numpy as np

from optix_renderer_tpu.scene import procedural
from optix_renderer_tpu.scene.config import parse_scene
from optix_renderer_tpu.scene.device import build_device_scene


def make_scene(tmp_path):
    json_path = procedural.write_cornell_scene(str(tmp_path / "cornell"))
    return parse_scene(json_path)


def test_parse_scene_counts(tmp_path):
    scene = make_scene(tmp_path)
    # 3 materials in cornell.obj -> 3 meshes, +1 light mesh appended by sync
    assert len(scene.model.meshes) == 4
    assert len(scene.tri_lights.meshes) == 1
    light = scene.model.meshes[-1]
    assert light.is_light and light.material_id == 0  # scene.cpp:5-13
    # material_id = mtl index + 1 (Model.cpp:223)
    assert sorted(m.material_id for m in scene.model.meshes[:-1]) == [1, 2, 3]
    assert scene.img_width == 512 and scene.spp == 1
    assert scene.renderers == [9]


def test_vertices_duplicated_per_face(tmp_path):
    scene = make_scene(tmp_path)
    for m in scene.model.meshes:
        # reference duplicates 3 verts per triangle (Model.cpp:186-189)
        assert len(m.vertex) == 3 * len(m.index)
        assert (m.index.reshape(-1) == np.arange(3 * len(m.index))).all()
        assert m.normal.shape == m.vertex.shape
        # normals unit-length
        np.testing.assert_allclose(np.linalg.norm(m.normal, axis=-1), 1.0, atol=1e-5)


def test_model_bounds(tmp_path):
    scene = make_scene(tmp_path)
    np.testing.assert_allclose(scene.model.bounds_min, [0, 0, 0], atol=1e-4)
    np.testing.assert_allclose(scene.model.bounds_max, [556, 548.8, 559.2], atol=1e-3)


def test_device_scene(tmp_path):
    scene = make_scene(tmp_path)
    ds = build_device_scene(scene)
    # 13 white quads + 1 green + 1 red = 15 quads -> 30 tris, +2 light tris
    assert ds.num_tris == 32
    assert ds.num_lights == 2
    # light normals point down (-y)
    np.testing.assert_allclose(np.asarray(ds.light_normal), [[0, -1, 0]] * 2, atol=1e-5)
    # light areas sum to 130 * 105 quad
    assert abs(float(ds.light_area.sum()) - 130 * 105) < 1e-2
    # light emission from MTL Ke
    np.testing.assert_allclose(np.asarray(ds.light_emit[0]), [17, 12, 4], atol=1e-5)
    # global tri indices reference valid vertices
    assert int(ds.tri_index.max()) == ds.vertices.shape[0] - 1
    # per-mesh table: exactly one light mesh
    assert int(ds.mesh_is_light.sum()) == 1


def test_missing_materials_raises(tmp_path):
    p = tmp_path / "nomtl.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    import pytest

    from optix_renderer_tpu.scene.obj_loader import load_obj

    with pytest.raises(RuntimeError):
        load_obj(str(p))  # Model.cpp:155-156 behaviour


def test_native_loader_matches_python(tmp_path):
    """The C++ geometry parser and the pure-Python fallback must produce
    identical Models (same grouping, duplication, and index semantics)."""
    import numpy as np
    import pytest

    from optix_renderer_tpu.native import parse_obj_native
    from optix_renderer_tpu.scene import procedural
    from optix_renderer_tpu.scene.obj_loader import _load_obj_from_native, _load_obj_python

    procedural.write_cornell_scene(str(tmp_path))
    for name in ("cornell.obj", "light.obj"):
        path = str(tmp_path / name)
        native = parse_obj_native(path)
        if native is None:
            pytest.skip("native loader unavailable (no compiler)")
        a = _load_obj_from_native(path, native)
        b = _load_obj_python(path)
        assert len(a.meshes) == len(b.meshes)
        for ma, mb in zip(a.meshes, b.meshes):
            np.testing.assert_array_equal(ma.vertex, mb.vertex)
            np.testing.assert_array_equal(ma.normal, mb.normal)
            np.testing.assert_array_equal(ma.texcoord, mb.texcoord)
            np.testing.assert_array_equal(ma.index, mb.index)
            assert ma.material_id == mb.material_id
            assert ma.diffuse_texture_id == mb.diffuse_texture_id
        np.testing.assert_array_equal(a.bounds_min, b.bounds_min)
