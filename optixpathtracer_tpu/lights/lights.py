"""Analytic light types: point / ambient / parallelogram-area.

Reference: cuda/Light.h (:31-71) point+ambient used by the whitted pipeline's
direct-lighting loop (cuda/whitted.cu:158-195), and the ParallelogramLight in
the path tracers' LaunchParams (LaunchParams.h:32-38 — vestigial there, the
probe does NEE, but kept for API parity and usable here).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.math import Vec3, cross, normalize
from ..core.rng import RngState, randf2

Array = jax.Array

LIGHT_POINT = 0
LIGHT_AMBIENT = 1
LIGHT_PARALLELOGRAM = 2


class LightTable(NamedTuple):
    """SoA table of lights; rows select fields by `kind`."""

    kind: Array  # (L,) int32
    position: Vec3  # point: position; parallelogram: corner
    v1: Vec3  # parallelogram edge 1
    v2: Vec3  # parallelogram edge 2
    color: Vec3  # color * intensity (point/ambient) or emission (area)
    intensity: Array

    @property
    def count(self) -> int:
        return self.kind.shape[0]


def make_point_light(position, color, intensity=1.0) -> dict:
    return dict(kind=LIGHT_POINT, position=position, v1=(0, 0, 0), v2=(0, 0, 0),
                color=color, intensity=intensity)


def make_ambient_light(color, intensity=1.0) -> dict:
    return dict(kind=LIGHT_AMBIENT, position=(0, 0, 0), v1=(0, 0, 0), v2=(0, 0, 0),
                color=color, intensity=intensity)


def make_parallelogram_light(corner, v1, v2, emission) -> dict:
    """ParallelogramLight (LaunchParams.h:32-38): corner + two edges."""
    return dict(kind=LIGHT_PARALLELOGRAM, position=corner, v1=v1, v2=v2,
                color=emission, intensity=1.0)


def build_lights(lights: list[dict]) -> LightTable:
    if not lights:
        lights = [make_ambient_light((0, 0, 0), 0.0)]

    def vec(name):
        a = np.array([l[name] for l in lights], np.float32)
        return Vec3(jnp.asarray(a[:, 0]), jnp.asarray(a[:, 1]), jnp.asarray(a[:, 2]))

    return LightTable(
        kind=jnp.asarray(np.array([l["kind"] for l in lights], np.int32)),
        position=vec("position"),
        v1=vec("v1"),
        v2=vec("v2"),
        color=vec("color"),
        intensity=jnp.asarray(np.array([l["intensity"] for l in lights], np.float32)),
    )


class QuadLight(NamedTuple):
    """Single parallelogram area light (LaunchParams.h ParallelogramLight,
    :32-38 — vestigial in the reference, first-class here). All Vec3 fields
    are scalars (one light)."""

    corner: Vec3
    v1: Vec3
    v2: Vec3
    emission: Vec3
    normal: Vec3
    area: Array

    @staticmethod
    def make(corner, v1, v2, emission) -> "QuadLight":
        import numpy as np

        c = np.asarray(corner, np.float32)
        a = np.asarray(v1, np.float32)
        b = np.asarray(v2, np.float32)
        e = np.asarray(emission, np.float32)
        n = np.cross(a, b)
        area = float(np.linalg.norm(n))
        n = n / max(area, 1e-20)

        def v(x):
            return Vec3(jnp.float32(x[0]), jnp.float32(x[1]), jnp.float32(x[2]))

        return QuadLight(v(c), v(a), v(b), v(e), v(n), jnp.float32(area))


def sample_parallelogram(
    light_corner: Vec3, light_v1: Vec3, light_v2: Vec3, state: RngState
) -> tuple[RngState, Vec3, Vec3, Array]:
    """Uniform point on the quad; returns (state, point, normal, area)."""
    state, u1, u2 = randf2(state)
    p = light_corner + light_v1 * u1 + light_v2 * u2
    n = normalize(cross(light_v1, light_v2))
    a = jnp.sqrt(
        (light_v1.y * light_v2.z - light_v1.z * light_v2.y) ** 2
        + (light_v1.z * light_v2.x - light_v1.x * light_v2.z) ** 2
        + (light_v1.x * light_v2.y - light_v1.y * light_v2.x) ** 2
    )
    return state, p, n, a
