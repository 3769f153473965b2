import base64
import json

import numpy as np
import pytest

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


def test_gltf_embedded_texture(tmp_path):
    """GLB with the texture EMBEDDED in the binary chunk via bufferView —
    the common exporter layout; round-1 skipped these (factor-only)."""
    import io
    import json as _json
    import struct

    import numpy as np
    from PIL import Image

    from optixpathtracer_tpu.io.gltf import load_gltf

    # 2x2 PNG: distinct quadrant colors
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], np.uint8
    )
    png = io.BytesIO()
    Image.fromarray(px).save(png, format="PNG")
    png_bytes = png.getvalue()
    png_bytes += b"\x00" * (-len(png_bytes) % 4)

    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    blob = pos.tobytes() + uv.tobytes() + idx.tobytes() + b"\x00\x00" + png_bytes
    off_uv = pos.nbytes
    off_idx = off_uv + uv.nbytes
    off_png = off_idx + idx.nbytes + 2

    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 1, "TEXCOORD_0": 2},
            "indices": 0, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [1, 1, 1, 1],
            "baseColorTexture": {"index": 0},
            "metallicFactor": 0.0, "roughnessFactor": 0.7}}],
        "textures": [{"source": 0}],
        "images": [{"bufferView": 3, "mimeType": "image/png"}],
        "buffers": [{"byteLength": len(blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": off_idx, "byteLength": idx.nbytes},
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": off_uv, "byteLength": uv.nbytes},
            {"buffer": 0, "byteOffset": off_png, "byteLength": len(png_bytes)},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5123, "count": 6, "type": "SCALAR"},
            {"bufferView": 1, "componentType": 5126, "count": 4, "type": "VEC3",
             "min": pos.min(0).tolist(), "max": pos.max(0).tolist()},
            {"bufferView": 2, "componentType": 5126, "count": 4, "type": "VEC2"},
        ],
    }
    js = _json.dumps(gltf).encode()
    js += b" " * (-len(js) % 4)
    glb = (
        struct.pack("<4sII", b"glTF", 2, 12 + 8 + len(js) + 8 + len(blob))
        + struct.pack("<I4s", len(js), b"JSON") + js
        + struct.pack("<I4s", len(blob), b"BIN\x00") + blob
    )
    path = tmp_path / "tex.glb"
    path.write_bytes(glb)

    hs, _lights = load_gltf(str(path))
    assert len(hs.textures) == 1
    tex = hs.textures[0]
    assert tex.shape == (2, 2, 3)
    np.testing.assert_allclose(tex[0, 0], (1, 0, 0))  # quadrants decoded
    mesh = hs.meshes[0]
    assert mesh.material["texture_id"] == 0
    assert mesh.texcoords is not None and len(mesh.texcoords) == 4


def test_gltf_undecodable_texture_degrades_to_factors(tmp_path):
    """An unsupported embedded image (non-base64 data URI, unknown codec,
    missing file) must not fail the scene load — the material keeps its
    factors and simply has no texture (Scene.cpp's tinygltf would have
    decoded or skipped it; crashing the whole load is strictly worse)."""
    import warnings

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([0, 1, 2], np.uint16)
    bin_data = pos.tobytes() + idx.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "indices": 1, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.9, 0.1, 0.2, 1.0],
            "baseColorTexture": {"index": 0},
        }}],
        "textures": [{"source": 0}],
        # percent-encoded (non-base64) data URI + a bogus KTX2 payload case
        "images": [{"uri": "data:image/png,%89PNG%0D%0A"}],
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
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(bin_data).decode(),
        }],
    }
    p = tmp_path / "badtex.gltf"
    p.write_text(json.dumps(doc))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        scene, _ = load_gltf(str(p))
    assert any("undecodable" in str(x.message) for x in w)
    m = scene.meshes[0]
    np.testing.assert_allclose(m.material["color"], (0.9, 0.1, 0.2), rtol=1e-6)
    assert m.material["texture_id"] == -1


def _reuse_gltf(tmp_path, n_nodes=6):
    """One mesh referenced by n_nodes nodes at different translations/scales
    (the node-reuse pattern the reference's IAS serves, Scene.cpp:1071-1150)."""
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]], np.float32)
    idx = np.array([0, 1, 2, 0, 2, 3], np.uint16)
    bin_data = pos.tobytes() + idx.tobytes()
    nodes = []
    for i in range(n_nodes):
        nodes.append({
            "mesh": 0,
            "translation": [2.0 * i, 0.0, -1.5 * i],
            "scale": [1.0 + 0.2 * i] * 3,
            "rotation": [0.0, np.sin(0.3 * i / 2), 0.0, np.cos(0.3 * i / 2)],
        })
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": list(range(n_nodes))}],
        "nodes": nodes,
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0},
                                    "indices": 1, "material": 0}]}],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.2, 0.6, 0.9, 1.0],
            "metallicFactor": 0.0, "roughnessFactor": 0.5}}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4, "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 6, "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 12},
        ],
        "buffers": [{
            "byteLength": len(bin_data),
            "uri": "data:application/octet-stream;base64,"
                   + base64.b64encode(bin_data).decode(),
        }],
    }
    p = tmp_path / "reuse.gltf"
    p.write_text(json.dumps(doc))
    return str(p)


@pytest.mark.slow
def test_gltf_tlas_node_reuse_matches_baked(tmp_path):
    """A mesh reused by N nodes traces ONE stored BLAS through the TLAS and
    renders the same image as the baked loader (which duplicates it N times)."""
    import jax.numpy as jnp

    from optixpathtracer_tpu.builder import compile_scene, compile_tlas
    from optixpathtracer_tpu.core.camera import Camera
    from optixpathtracer_tpu.core.math import Vec3
    from optixpathtracer_tpu.io.gltf import load_gltf_tlas
    from optixpathtracer_tpu.ops.traverse_cluster import closest_hit_cluster

    path = _reuse_gltf(tmp_path, n_nodes=6)
    hs_t, groups, instances, _ = load_gltf_tlas(path)
    assert len(hs_t.meshes) == 1          # stored ONCE
    assert len(groups) == 1 and len(instances) == 6

    hs_b, _ = load_gltf(path)
    assert len(hs_b.meshes) == 6          # baked duplicates

    ct = compile_tlas(hs_t, groups, instances, cluster_size=64)
    cb = compile_scene(hs_b, cluster_size=64, build_wide_bvh=False)
    assert ct.num_triangles == cb.num_triangles == 12

    rng = np.random.default_rng(3)
    o = rng.uniform(-3, 13, (512, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 4.0, 512)
    d = rng.normal(0, 1, (512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))
    rt = closest_hit_cluster(ct.clusters, ov, dv, 1e-3, 1e16, interpret=True)
    rb = closest_hit_cluster(cb.clusters, ov, dv, 1e-3, 1e16, interpret=True)
    hit_t = np.asarray(rt.tri) >= 0
    hit_b = np.asarray(rb.tri) >= 0
    assert hit_t.any()
    assert (hit_t == hit_b).all()
    np.testing.assert_allclose(
        np.asarray(rt.t)[hit_b], np.asarray(rb.t)[hit_b], rtol=2e-4, atol=2e-4
    )
