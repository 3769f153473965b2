"""Demand-loaded textures as a first-class ENGINE path: Renderer(demand=mgr)
shades from the sparse pool, every launch's page-usage bitmap is serviced
between launches, and once the visible pages are resident the render is
EXACTLY the resident-TexturePool render (both are wrap bilinear; only the
storage differs). The reference's DemandLoader launchPrepare/processRequests
cycle (lib/DemandLoading DemandLoaderImpl — dead code upstream) as a live
render loop.
"""
import numpy as np
import jax.numpy as jnp

from optixpathtracer_tpu.builder import compile_scene
from optixpathtracer_tpu.core.camera import Camera
from optixpathtracer_tpu.core.materials import make_material
from optixpathtracer_tpu.core.math import Vec3
from optixpathtracer_tpu.core.scene import HostScene, Mesh
from optixpathtracer_tpu.engine.renderer import Renderer
from optixpathtracer_tpu.engine.wavefront import RenderConfig
from optixpathtracer_tpu.io.demand import DemandTextureManager, TILE
from optixpathtracer_tpu.lights.probe import build_probe


def _textured_scene(tex_size=3 * TILE):
    rng = np.random.default_rng(23)
    tex = rng.uniform(0, 1, (tex_size, tex_size, 3)).astype(np.float32)
    hs = HostScene()
    tid = hs.add_texture(tex)
    quad = Mesh(
        vertices=np.array([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32),
        indices=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        normals=np.array([[0, 1, 0]] * 4, np.float32),
        texcoords=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        material=make_material(color=(1, 1, 1), texture_id=tid),
    )
    hs.add_mesh(quad)
    hs.add_box(make_material(color=(0.8, 0.4, 0.2), roughness=0.4),
               pos=(0, 0.4, 0), extent=(0.4, 0.4, 0.4))
    return hs


def _setup(hs, demand=None, spp=2):
    cs = compile_scene(hs)
    probe = build_probe(np.full((8, 16, 3), 1.0, np.float32))
    cfg = RenderConfig(width=40, height=32, samples_per_launch=spp, max_depth=2)
    cam = Camera(eye=(0, 4, 3), lookat=(0, 0, 0), up=(0, 1, 0), fov_y=60,
                 aspect_ratio=40 / 32)
    return Renderer(cs, probe, cfg, cam, demand=demand)


def test_demand_render_converges_to_resident_render():
    hs = _textured_scene()
    mgr = DemandTextureManager.from_host_scene(hs, capacity=64)

    r_demand = _setup(hs, demand=mgr)
    r_resident = _setup(hs)

    # frame 0 shades misses with the fallback color and requests pages
    r_demand.render()
    assert mgr.pages_loaded > 0
    loaded_f0 = mgr.pages_loaded

    # restart accumulation with pages now resident: identical RNG streams,
    # identical storage contents -> bit-comparable images
    r_demand.accum = Vec3.zeros((40 * 32,))
    r_demand.subframe_index = 0
    r_demand.render()
    r_resident.render()
    a = r_demand.accum_image()
    b = r_resident.accum_image()
    np.testing.assert_allclose(a, b, atol=1e-5)
    # steady state: no new pages after the working set converged
    assert mgr.pages_loaded == loaded_f0


def test_demand_render_first_frame_uses_fallback():
    hs = _textured_scene()
    mgr = DemandTextureManager.from_host_scene(hs, capacity=64)
    r = _setup(hs, demand=mgr)
    img0 = None
    r.render()
    img0 = r.accum_image()
    r2 = _setup(hs)
    r2.render()
    ref = r2.accum_image()
    # frame 0 differs from the resident render (fallback albedo on the quad)
    assert float(np.abs(img0 - ref).max()) > 1e-3


def test_demand_render_multi_tile_dispatch_ors_usage():
    """dispatch_tiles > 1: per-chunk usage bitmaps OR together (not concat),
    and the serviced union makes the next frame exact."""
    hs = _textured_scene()
    mgr = DemandTextureManager.from_host_scene(hs, capacity=64)
    cs = compile_scene(hs)
    probe = build_probe(np.full((8, 16, 3), 1.0, np.float32))
    cfg = RenderConfig(width=40, height=32, samples_per_launch=2, max_depth=2,
                       dispatch_tiles=2)
    cam = Camera(eye=(0, 4, 3), lookat=(0, 0, 0), up=(0, 1, 0), fov_y=60,
                 aspect_ratio=40 / 32)
    r = Renderer(cs, probe, cfg, cam, demand=mgr)
    r.render()
    assert r._last.tex_usage.shape == (mgr.num_pages,)
    assert mgr.pages_loaded > 0
    r.accum = Vec3.zeros((40 * 32,))
    r.subframe_index = 0
    r.render()
    r_ref = _setup(hs)
    r_ref.render()
    np.testing.assert_allclose(r.accum_image(), r_ref.accum_image(), atol=1e-5)


def test_demand_render_distributed_matches_single_device():
    """Demand textures over the device mesh: per-shard usage bitmaps
    OR-reduce across 'tiles' (one psum/frame), the single host pager
    services the union, and the converged sharded render equals the
    single-device demand render exactly."""
    from optixpathtracer_tpu.parallel.tiles import DistributedRenderer, make_mesh

    hs = _textured_scene()
    cs = compile_scene(hs)
    probe = build_probe(np.full((8, 16, 3), 1.0, np.float32))
    cfg = RenderConfig(width=40, height=32, samples_per_launch=2, max_depth=2)
    cam = Camera(eye=(0, 4, 3), lookat=(0, 0, 0), up=(0, 1, 0), fov_y=60,
                 aspect_ratio=40 / 32)

    mgr_d = DemandTextureManager.from_host_scene(hs, capacity=64)
    dist = DistributedRenderer(cs, probe, cfg, cam, mesh=make_mesh(),
                               demand=mgr_d)
    dist.render()  # frame 0: fallback shading + union page requests
    assert mgr_d.pages_loaded > 0

    mgr_s = DemandTextureManager.from_host_scene(hs, capacity=64)
    single = _setup(hs, demand=mgr_s)
    single.render()
    # both pagers saw the same working set (union across shards == the
    # single wavefront's set: same pixels, same RNG streams)
    assert mgr_d.pages_loaded == mgr_s.pages_loaded

    # converged frame: restart accumulation with pages resident
    from optixpathtracer_tpu.core.math import Vec3 as _V
    dist.accum = jax.tree.map(lambda a: a * 0, dist.accum)
    dist.subframe_index = 0
    dist.render()
    r_ref = _setup(hs)  # resident TexturePool reference
    r_ref.config = cfg
    r_ref.render()
    np.testing.assert_allclose(dist.accum_image(), r_ref.accum_image(),
                               atol=1e-5)


import jax  # noqa: E402  (used by the distributed test's accum reset)
