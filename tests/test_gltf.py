import base64
import json

import numpy as np

from optixpathtracer_tpu.io.gltf import load_gltf


def _tri_gltf(tmp_path, translation=None):
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    bin_data = pos.tobytes() + idx.tobytes()
    node = {"mesh": 0}
    if translation:
        node["translation"] = translation
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [node],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {"baseColorFactor": [0.9, 0.1, 0.2, 1.0],
                                                 "metallicFactor": 0.0,
                                                 "roughnessFactor": 0.7}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "buffers": [{
            "byteLength": len(bin_data),
            "uri": "data:application/octet-stream;base64," + base64.b64encode(bin_data).decode(),
        }],
    }
    p = tmp_path / "tri.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


def test_gltf_triangle(tmp_path):
    scene, lights = load_gltf(_tri_gltf(tmp_path))
    assert len(scene.meshes) == 1
    m = scene.meshes[0]
    assert m.vertices.shape == (3, 3)
    np.testing.assert_allclose(m.material["color"], (0.9, 0.1, 0.2), rtol=1e-6)
    assert m.material["roughness"] == 0.7
    assert len(lights) >= 1  # default ambient


def test_gltf_node_transform(tmp_path):
    scene, _ = load_gltf(_tri_gltf(tmp_path, translation=[5.0, 0.0, 0.0]))
    np.testing.assert_allclose(scene.meshes[0].vertices[:, 0].min(), 5.0, atol=1e-6)


def test_gltf_renders(tmp_path):
    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.core.camera import Camera
    from optixpathtracer_tpu.core.math import Vec3, normalize
    from optixpathtracer_tpu.engine.wavefront import CameraParams
    from optixpathtracer_tpu.ops.traverse import closest_hit
    import jax.numpy as jnp

    scene, _ = load_gltf(_tri_gltf(tmp_path))
    cs = compile_scene(scene)
    o = Vec3.of([0.3], [0.3], [2.0])
    d = Vec3.of([0.0], [0.0], [-1.0])
    rec = closest_hit(cs.bvh, cs.scene, o, d)
    assert bool(np.asarray(rec.hit)[0])
