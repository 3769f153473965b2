"""Config 1 — '04HelloRaytracing': primary visibility + one hard shadow ray.

Reference: 04HelloRaytracing/deviceProgram.cu — raygen shoots one centered ray
per pixel (:195-229), closest hit interpolates the shading normal (geometric
fallback, :83-103), modulates by the diffuse texture (:109-117), traces ONE
shadow ray toward a fixed light point (:126-150), and shades
(.1 + (.2 + .8*lightVisibility) * cosDN) * diffuseColor (:156-161); misses
are black (:167-170); output packs 0xAABBGGRR (:231-242).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..builder import CompiledScene
from ..core.camera import Camera
from ..core.math import Vec3, dot, faceforward, normalize, where
from ..engine.wavefront import CameraParams
from ..ops.dispatch import trace_closest, trace_occluded

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class HelloConfig:
    width: int = 1200
    height: int = 800
    light_pos: tuple = (-907.108, 2205.875, -400.0267)  # deviceProgram.cu:126


def render_hello(
    cs: CompiledScene,
    cfg: HelloConfig,
    cam: CameraParams,
    pixel_x: Array,
    pixel_y: Array,
) -> Vec3:
    """Flat-shaded primary-visibility pass; returns (N,) linear color."""
    n = pixel_x.shape[0]
    # ray through pixel center, screen in [0,1]^2 (deviceProgram.cu:210-216)
    sx = (pixel_x.astype(jnp.float32) + 0.5) / cfg.width
    sy = (pixel_y.astype(jnp.float32) + 0.5) / cfg.height
    d = normalize(cam.u * (sx - 0.5) * 2.0 + cam.v * (sy - 0.5) * 2.0 + cam.w * 1.0)
    zf = d.x * 0.0
    o = Vec3(cam.eye.x + zf, cam.eye.y + zf, cam.eye.z + zf)

    rec = trace_closest(cs, o, d, 0.0, 1e20)
    tri = jnp.maximum(rec.tri, 0)
    scene = cs.scene

    # interpolated shading normal with geometric fallback + faceforward
    w0 = 1.0 - rec.u - rec.v
    from ..core.math import cross

    v0 = scene.v0.take(tri)
    v1 = scene.v1.take(tri)
    v2 = scene.v2.take(tri)
    ng = normalize(cross(v1 - v0, v2 - v0))
    ng = faceforward(ng, -d, ng)
    ns = scene.n0.take(tri) * w0 + scene.n1.take(tri) * rec.u + scene.n2.take(tri) * rec.v
    has = scene.has_shading_normal[tri]
    ns = normalize(where(has, ns, ng))
    # flip shading normal into the geometric hemisphere (:101-103)
    flip = dot(ng, ns) < 0.0
    ns = where(flip, ns - ng * (2.0 * dot(ng, ns)), ns)

    mat = scene.materials.take(scene.material_id[tri])
    tu = scene.uv0u[tri] * w0 + scene.uv1u[tri] * rec.u + scene.uv2u[tri] * rec.v
    tv = scene.uv0v[tri] * w0 + scene.uv1v[tri] * rec.u + scene.uv2v[tri] * rec.v
    tex = scene.textures.sample_bilinear(mat.texture_id, tu, tv)
    diffuse = where(mat.texture_id >= 0, mat.color * tex, mat.color)

    p = o + d * rec.t
    lp = Vec3(
        jnp.full((n,), cfg.light_pos[0]),
        jnp.full((n,), cfg.light_pos[1]),
        jnp.full((n,), cfg.light_pos[2]),
    )
    ldir = lp - p  # unnormalized: shadow ray parameterized to t in (0,1)
    t_max = jnp.where(rec.hit, 1.0 - 1e-3, 0.0)
    occ = trace_occluded(cs, p + ng * 1e-3, ldir, 1e-3, t_max)
    light_vis = jnp.where(occ, 0.0, 1.0)

    cos_dn = 0.1 + 0.8 * jnp.abs(dot(d, ns))
    color = diffuse * ((0.1 + (0.2 + 0.8 * light_vis) * cos_dn))
    return where(rec.hit, color, Vec3.zeros((n,)))


class HelloRenderer:
    """Single-shot renderer for the 04 config (no accumulation needed)."""

    def __init__(self, cs: CompiledScene, cfg: HelloConfig, camera: Camera):
        self.cs = cs
        self.cfg = cfg
        self.camera = camera
        n = cfg.width * cfg.height
        ys, xs = np.divmod(np.arange(n, dtype=np.int32), cfg.width)
        self._px = jnp.asarray(xs)
        self._py = jnp.asarray(ys)
        self._render = jax.jit(
            lambda cam, px, py: render_hello(self.cs, self.cfg, cam, px, py)
        )

    def render(self) -> np.ndarray:
        """(H, W, 3) float in [0,1], top row first."""
        cam = CameraParams.from_camera(self.camera)
        out = self._render(cam, self._px, self._py)
        img = np.stack([np.asarray(out.x), np.asarray(out.y), np.asarray(out.z)], -1)
        return np.clip(img.reshape(self.cfg.height, self.cfg.width, 3)[::-1], 0, 1)

    def render_rgba8(self) -> np.ndarray:
        """0xAABBGGRR-style 8-bit output (deviceProgram.cu:231-242)."""
        img = self.render()
        rgb = (img * 255.99).astype(np.uint8)
        a = np.full(rgb.shape[:2] + (1,), 255, np.uint8)
        return np.concatenate([rgb, a], axis=-1)
