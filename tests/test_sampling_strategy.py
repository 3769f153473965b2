"""Engine-level sampling strategies (RenderConfig.sampling).

The reference carries a compile-time Sample1D/Sample2D strategy switch
(HelloPathtracing_original/sample.h:238-289, dormant at USE_RANDOM=1) plus
host blue-noise generators (:80-214). Here the strategy is a runtime config
consumed by the engine's variance-dominant 2D draws (AA jitter, first-bounce
NEE probe pair, first-bounce BSDF lobe pair). These tests pin:
  * stratum coverage: each pixel visits every stratum exactly once per epoch;
  * unbiasedness: stratified/blue render means match the random-mode mean;
  * the point: measured per-launch estimator variance drops vs random.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from optixpathtracer_tpu.builder import compile_scene
from optixpathtracer_tpu.core.camera import Camera
from optixpathtracer_tpu.core.materials import make_material
from optixpathtracer_tpu.core.scene import HostScene
from optixpathtracer_tpu.engine.wavefront import (
    _LD_SALT_NEE,
    CameraParams,
    RenderConfig,
    _ld_bases,
    trace_wavefront,
)
from optixpathtracer_tpu.lights.probe import build_probe

W, H = 24, 16


def test_stratified_bases_cover_every_stratum_once_per_epoch():
    cfg = RenderConfig(sampling="stratified", sampling_strata=16)
    pix = jnp.full((64,), 1234, jnp.uint32)
    ctr = jnp.arange(64, dtype=jnp.uint32)
    b1, b2, sc = _ld_bases(cfg, pix, ctr, _LD_SALT_NEE)
    assert sc == 0.25
    cells = set(zip(np.asarray(b1 * 4).astype(int).tolist(),
                    np.asarray(b2 * 4).astype(int).tolist()))
    assert len(cells) == 16  # each epoch of 16 covers all 16 strata
    # the two 16-sample epochs visit strata in the same pixel-rotated order
    first, second = np.asarray(b1[:16]), np.asarray(b1[16:32])
    np.testing.assert_array_equal(first, second)


def test_blue_bases_in_unit_square_and_rotate_per_epoch():
    cfg = RenderConfig(sampling="blue", sampling_strata=16)
    pix = jnp.full((48,), 77, jnp.uint32)
    ctr = jnp.arange(48, dtype=jnp.uint32)
    b1, b2, sc = _ld_bases(cfg, pix, ctr, _LD_SALT_NEE)
    assert sc == 0.0
    a1, a2 = np.asarray(b1), np.asarray(b2)
    assert ((a1 >= 0) & (a1 < 1)).all() and ((a2 >= 0) & (a2 < 1)).all()
    # different epochs get different Cranley-Patterson rotations
    assert not np.allclose(a1[:16], a1[16:32])


def test_bad_strategy_and_nonsquare_strata_raise():
    pix = jnp.zeros((4,), jnp.uint32)
    ctr = jnp.zeros((4,), jnp.uint32)
    with pytest.raises(ValueError):
        # sobol is a valid ENGINE strategy but never routes through
        # _ld_bases (it has no stratum bases); unknown names also raise
        _ld_bases(RenderConfig(sampling="halton"), pix, ctr, 1)
    with pytest.raises(ValueError):
        _ld_bases(RenderConfig(sampling="stratified", sampling_strata=12),
                  pix, ctr, 1)


def _setup():
    hs = HostScene()
    hs.add_box(make_material(color=(0.8, 0.8, 0.8)), pos=(0, -0.1, 0),
               extent=(6, 0.1, 6))
    hs.add_box(make_material(color=(0.7, 0.3, 0.2), roughness=0.5),
               pos=(0, 0.5, 0), extent=(0.5, 0.5, 0.5))
    cs = compile_scene(hs)
    # smooth gradient sky: NEE draws spread over the whole sphere, so
    # stratifying the CDF-inversion input directly stratifies the sampled
    # DIRECTION — the cos-weighted integral is where the variance is
    v = np.linspace(0.05, 2.0, 16, dtype=np.float32)
    sky = np.broadcast_to(v[:, None, None], (16, 32, 3)).copy()
    probe = build_probe(sky)
    cam = Camera(eye=(3, 2, 4), lookat=(0, 0.4, 0), up=(0, 1, 0), fov_y=45,
                 aspect_ratio=W / H)
    return cs, probe, cam


def _launch_means(cs, probe, cam, sampling: str, subframes: int, spp: int,
                  max_depth: int = 0):
    """Per-pixel per-launch mean radiance for `subframes` independent
    launches (no progressive averaging — each launch is one estimator).
    max_depth=0 = direct lighting: every variance dimension (AA + NEE) is
    one the strategy actually stratifies."""
    cfg = RenderConfig(width=W, height=H, samples_per_launch=spp,
                       max_depth=max_depth, traversal="lockstep",
                       sampling=sampling, sampling_strata=16)
    cp = CameraParams.from_camera(cam)
    ys, xs = np.divmod(np.arange(W * H, dtype=np.int32), W)
    px, py = jnp.asarray(xs), jnp.asarray(ys)
    outs = []
    for sub in range(subframes):
        o = trace_wavefront(cs, probe, cfg, cp, px, py, jnp.uint32(sub))
        outs.append(np.stack(
            [np.asarray(o.color.x), np.asarray(o.color.y), np.asarray(o.color.z)],
            -1) / spp)
    return np.stack(outs)  # (S, N, 3)


def test_stratified_reduces_variance_and_stays_unbiased():
    cs, probe, cam = _setup()
    spp, subs = 16, 6
    rnd = _launch_means(cs, probe, cam, "random", subs, spp)
    strat = _launch_means(cs, probe, cam, "stratified", subs, spp)

    # unbiased: grand means agree (same scene, independent estimators)
    m_r, m_s = rnd.mean(), strat.mean()
    assert abs(m_s - m_r) / m_r < 0.03, (m_r, m_s)

    # variance of the per-launch estimator across launches, averaged over
    # pixels: one launch covers all 16 strata once, so the first-bounce
    # integrals are jittered-stratified instead of iid
    # (measured: 0.00050 vs 0.00282 — a 5.6x cut; gate at 2x)
    v_r = rnd.var(axis=0).mean()
    v_s = strat.var(axis=0).mean()
    assert v_s < 0.5 * v_r, (v_r, v_s)


@pytest.mark.slow
def test_blue_noise_reduces_variance_and_stays_unbiased():
    cs, probe, cam = _setup()
    spp, subs = 16, 6
    rnd = _launch_means(cs, probe, cam, "random", subs, spp)
    blue = _launch_means(cs, probe, cam, "blue", subs, spp)
    m_r, m_b = rnd.mean(), blue.mean()
    assert abs(m_b - m_r) / m_r < 0.03, (m_r, m_b)
    # measured: 0.00118 vs 0.00282 — a 2.4x cut; gate at 1.3x
    v_r = rnd.var(axis=0).mean()
    v_b = blue.var(axis=0).mean()
    assert v_b < 0.77 * v_r, (v_r, v_b)


def test_stratified_composes_with_sort_and_batch():
    """The ld leaves ride the path sorts: sorted/batched launches reproduce
    the plain launch exactly (same streams, same strata)."""
    cs, probe, cam = _setup()
    # antialias off: the batch fold composites the backplate as a mean over
    # samples vs the loop's last-sample (a pre-existing, documented batch
    # mode difference on background pixels — test_batch_spp); with a fixed
    # pixel center the backplate is sample-invariant and the comparison is
    # exact while NEE/BSDF strata still ride the sorts
    cfg = RenderConfig(width=W, height=H, samples_per_launch=2, max_depth=1,
                       traversal="lockstep", sampling="stratified",
                       sampling_strata=16, antialias=False)
    cp = CameraParams.from_camera(cam)
    ys, xs = np.divmod(np.arange(W * H, dtype=np.int32), W)
    px, py = jnp.asarray(xs), jnp.asarray(ys)
    base = trace_wavefront(cs, probe, cfg, cp, px, py, jnp.uint32(0))
    srt = trace_wavefront(
        cs, probe, dataclasses.replace(cfg, sort_rays=True), cp, px, py,
        jnp.uint32(0))
    bat = trace_wavefront(
        cs, probe, dataclasses.replace(cfg, batch_spp=True), cp, px, py,
        jnp.uint32(0))
    np.testing.assert_allclose(np.asarray(srt.color.x),
                               np.asarray(base.color.x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bat.color.x),
                               np.asarray(base.color.x), rtol=1e-5, atol=1e-6)
