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


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.abspath(__file__))
    save_obj(os.path.join(outdir, "cornell_box.obj"), cornell_box())
    print("wrote", os.path.join(outdir, "cornell_box.obj"))
    save_obj(os.path.join(outdir, "city_small.obj"), city(800))
    print("wrote", os.path.join(outdir, "city_small.obj"))


if __name__ == "__main__":
    main()
