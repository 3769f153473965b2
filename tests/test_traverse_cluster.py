"""Cluster traversal backend: exactness vs brute force and the dense oracle.

The cluster backend (ops/traverse_cluster.py) must be EXACT — its cull is
conservative and its per-triangle test is plain f32 Moller-Trumbore — so
every test here is equality of hit ids (not tolerance-based image compare).
The Pallas kernel runs in interpreter mode on CPU.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from optixpathtracer_tpu.bvh.clusters import build_clusters
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.ops.intersect import BIG_T
from optixpathtracer_tpu.ops.traverse_cluster import (
    any_hit_cluster,
    block_cull,
    closest_hit_cluster,
    reference_closest,
)


def _random_tris(rng, t, extent=2.0, size=0.3):
    ctr = rng.uniform(-extent, extent, (t, 3)).astype(np.float32)
    v0 = ctr + rng.normal(0, size, (t, 3)).astype(np.float32)
    v1 = ctr + rng.normal(0, size, (t, 3)).astype(np.float32)
    v2 = ctr + rng.normal(0, size, (t, 3)).astype(np.float32)
    order = np.argsort(ctr[:, 0], kind="stable")  # cheap spatial sort
    return v0[order], v1[order], v2[order]


def _random_rays(rng, n, extent=4.0):
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (
        Vec3(*(jnp.asarray(o[:, i]) for i in range(3))),
        Vec3(*(jnp.asarray(d[:, i]) for i in range(3))),
        o,
        d,
    )


def _brute(v0, v1, v2, o, d, t_min, t_max):
    n = len(o)
    e1 = (v1 - v0).astype(np.float64)
    e2 = (v2 - v0).astype(np.float64)
    best_t = np.asarray(np.broadcast_to(t_max, (n,)), np.float64).copy()
    best_tri = np.full(n, -1)
    for j in range(len(v0)):
        p = np.cross(d.astype(np.float64), e2[j])
        det = p @ e1[j]
        ok = np.abs(det) > 0
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = o.astype(np.float64) - v0[j]
        u = (tv * p).sum(1) * inv
        q = np.cross(tv, e1[j])
        vv = (d.astype(np.float64) * q).sum(1) * inv
        t = (q @ e2[j]) * inv
        hit = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (t > t_min) & (t < best_t)
        best_t = np.where(hit, t, best_t)
        best_tri = np.where(hit, j, best_tri)
    return best_t, best_tri


@pytest.mark.parametrize("cluster_size", [64, 128])
def test_oracle_matches_brute_force(rng, cluster_size):
    v0, v1, v2 = _random_tris(rng, 257)
    cs = build_clusters(v0, v1, v2, 257, cluster_size=cluster_size)
    ov, dv, o, d = _random_rays(rng, 400)
    ref = reference_closest(cs, ov, dv, 1e-3, 1e16)
    bt, btri = _brute(v0, v1, v2, o, d, 1e-3, 1e16)
    assert (np.asarray(ref.tri) == btri).all()
    hits = btri >= 0
    assert np.abs(np.asarray(ref.t)[hits] - bt[hits]).max() < 1e-4


@pytest.mark.slow
def test_pallas_matches_oracle(rng):
    v0, v1, v2 = _random_tris(rng, 300)
    cs = build_clusters(v0, v1, v2, 300, cluster_size=64)
    ov, dv, _, _ = _random_rays(rng, 500)
    ref = reference_closest(cs, ov, dv, 1e-3, 1e16)
    rec = closest_hit_cluster(cs, ov, dv, 1e-3, 1e16, block=128, interpret=True)
    assert (np.asarray(rec.tri) == np.asarray(ref.tri)).all()
    # the winner identity (tri) is exact — that's what the bench quality
    # gate relies on. t/u/v are the same f32 Cramer formulas but a leaner
    # kernel (epilogue diet) lets XLA fuse/contract differently, and u/v
    # are re-derived outside the kernel (_recover_uv) — allow ulps.
    hits = np.asarray(ref.tri) >= 0
    t_rel = np.abs(np.asarray(rec.t) - np.asarray(ref.t))[hits]
    t_rel /= np.maximum(1.0, np.abs(np.asarray(ref.t))[hits])
    assert t_rel.max() < 1e-6
    # small-det triangles amplify the rounding: a few e-6 absolute on
    # barycentrics is invisible to attribute interpolation
    assert np.abs(np.asarray(rec.u) - np.asarray(ref.u)).max() < 1e-5
    assert np.abs(np.asarray(rec.v) - np.asarray(ref.v)).max() < 1e-5


def test_per_ray_t_intervals_and_dead_rays(rng):
    v0, v1, v2 = _random_tris(rng, 200)
    cs = build_clusters(v0, v1, v2, 200, cluster_size=64)
    ov, dv, o, d = _random_rays(rng, 300)
    # a third of the rays dead (t_max == 0), varied finite t_max elsewhere
    t_max = np.where(rng.random(300) < 0.33, 0.0, rng.uniform(1, 8, 300)).astype(
        np.float32
    )
    rec = closest_hit_cluster(
        cs, ov, dv, 1e-3, jnp.asarray(t_max), block=128, interpret=True
    )
    bt, btri = _brute(v0, v1, v2, o, d, 1e-3, t_max)
    assert (np.asarray(rec.tri) == btri).all()
    dead = t_max == 0.0
    assert (np.asarray(rec.tri)[dead] == -1).all()
    assert (np.asarray(rec.t)[dead] == BIG_T).all()


def test_non_multiple_block_sizes(rng):
    """N not a multiple of the ray block: padding must not change results."""
    v0, v1, v2 = _random_tris(rng, 100)
    cs = build_clusters(v0, v1, v2, 100, cluster_size=64)
    ov, dv, o, d = _random_rays(rng, 177)
    rec = closest_hit_cluster(cs, ov, dv, 1e-3, 1e16, block=128, interpret=True)
    bt, btri = _brute(v0, v1, v2, o, d, 1e-3, 1e16)
    assert rec.tri.shape == (177,)
    assert (np.asarray(rec.tri) == btri).all()


@pytest.mark.slow
def test_any_hit_matches_closest(rng):
    v0, v1, v2 = _random_tris(rng, 150)
    cs = build_clusters(v0, v1, v2, 150, cluster_size=64)
    ov, dv, o, d = _random_rays(rng, 256)
    occ, ovf = any_hit_cluster(cs, ov, dv, 1e-2, 10.0, interpret=True)
    bt, btri = _brute(v0, v1, v2, o, d, 1e-2, 10.0)
    assert (np.asarray(occ) == (btri >= 0)).all()
    assert float(ovf) == 0.0


def test_cull_is_conservative(rng):
    """Every triangle hit found by brute force must come from a supercluster
    the cull kept for that ray's block (it must never drop a needed one)."""
    from optixpathtracer_tpu.bvh.clusters import SUPER

    v0, v1, v2 = _random_tris(rng, 320)
    cs = build_clusters(v0, v1, v2, 320, cluster_size=64)
    ov, dv, o, d = _random_rays(rng, 384)
    bt, btri = _brute(v0, v1, v2, o, d, 1e-3, 1e16)
    cull = block_cull(cs, ov, dv, jnp.float32(1e-3), jnp.float32(1e16), 128)
    ids = np.asarray(cull.ids)
    count = np.asarray(cull.count)[:, 0]
    kept = [set(ids[b, : count[b]].tolist()) for b in range(ids.shape[0])]
    for i in np.nonzero(btri >= 0)[0]:
        sid = btri[i] // (cs.cluster_size * SUPER)
        assert sid in kept[i // 128], (i, btri[i])


def test_single_cluster_and_tiny_scene(rng):
    v0, v1, v2 = _random_tris(rng, 5)
    cs = build_clusters(v0, v1, v2, 5, cluster_size=64)
    assert cs.num_supers == 1  # clusters are padded to one full super
    ov, dv, o, d = _random_rays(rng, 64)
    rec = closest_hit_cluster(cs, ov, dv, 1e-3, 1e16, block=128, interpret=True)
    bt, btri = _brute(v0, v1, v2, o, d, 1e-3, 1e16)
    assert (np.asarray(rec.tri) == btri).all()


@pytest.mark.slow
def test_sub_block_gating_matches_whole_block():
    """groups=8 (per-16-ray sub-block gates) must be exactly equivalent to
    groups=1 (whole-block union gates) — the masks are conservative subsets.
    Runs the real gate bit-arithmetic through the interpret path."""
    import numpy as np

    from optixpathtracer_tpu.builder import compile_scene
    from optixpathtracer_tpu.core.materials import make_material
    from optixpathtracer_tpu.core.math import Vec3
    from optixpathtracer_tpu.core.scene import HostScene
    from optixpathtracer_tpu.ops.traverse_cluster import (
        any_hit_cluster,
        closest_hit_cluster,
    )

    rng = np.random.default_rng(3)
    hs = HostScene()
    for _ in range(40):
        hs.add_box(
            make_material(),
            pos=rng.uniform(-4, 4, 3),
            extent=rng.uniform(0.2, 0.8, 3),
        )
    cs = compile_scene(hs).clusters
    n = 256
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    r1 = closest_hit_cluster(cs, ov, dv, 1e-3, 1e16, interpret=True, groups=1)
    r8 = closest_hit_cluster(cs, ov, dv, 1e-3, 1e16, interpret=True, groups=8)
    np.testing.assert_array_equal(np.asarray(r1.tri), np.asarray(r8.tri))
    np.testing.assert_array_equal(np.asarray(r1.t), np.asarray(r8.t))

    o1, _ = any_hit_cluster(cs, ov, dv, 1e-2, 1e16, interpret=True, groups=1)
    o8, _ = any_hit_cluster(cs, ov, dv, 1e-2, 1e16, interpret=True, groups=8)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o8))


def test_cluster_exact_on_hostile_geometry(rng):
    """Slab-cull exactness on adversarial geometry (VERDICT r3 item 5):
    nothing axis-aligned — a rotated city on a sliver-triangle heightfield.
    The cull must stay conservative for boxes it can only bound loosely."""
    from bench import build_hostile_scene
    from optixpathtracer_tpu.builder import compile_scene

    hs = build_hostile_scene(n_boxes=60, terrain_grid=(32, 16))
    cs = compile_scene(hs, build_wide_bvh=False, cluster_size=64).clusters

    n = 512
    half = n // 2
    # interior bounce-like rays + grazing rays nearly parallel to the terrain
    o1 = rng.uniform(-40, 40, (half, 3)).astype(np.float32)
    o1[:, 1] = rng.uniform(0.5, 6.0, half)
    d1 = rng.normal(0, 1, (half, 3)).astype(np.float32)
    o2 = rng.uniform(-40, 40, (half, 3)).astype(np.float32)
    o2[:, 1] = rng.uniform(-1.0, 3.0, half)
    d2 = rng.normal(0, 1, (half, 3)).astype(np.float32)
    d2[:, 1] *= 0.05  # grazing: the slab test's worst case on slivers
    o = np.concatenate([o1, o2])
    d = np.concatenate([d1, d2])
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ov = Vec3(*(jnp.asarray(o[:, i]) for i in range(3)))
    dv = Vec3(*(jnp.asarray(d[:, i]) for i in range(3)))

    fast = closest_hit_cluster(cs, ov, dv, 1e-3, 1e16)
    ref = reference_closest(cs, ov, dv, 1e-3, 1e16)
    assert (np.asarray(fast.tri) == np.asarray(ref.tri)).all()
    hits = np.asarray(ref.tri) >= 0
    assert hits.sum() > n // 4  # the ray set actually exercises geometry
    np.testing.assert_allclose(
        np.asarray(fast.t)[hits], np.asarray(ref.t)[hits], rtol=1e-6, atol=1e-5
    )
