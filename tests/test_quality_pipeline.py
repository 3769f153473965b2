"""The bench quality track's composed pipeline at test scale.

bench.py quality_track row 2 composes three subsystems — Owen-scrambled
Sobol sampling + variance-guided adaptive top-K refinement + demodulated
variance-guided A-Trous denoising — and its headline claim is that the
composition beats raw uniform accumulation at equal quality. This pins the
composition in the default tier: at an EQUAL total-sample budget (rounded
up in uniform's favor) the composed image must have lower RMSE against a
converged reference than uniform random PT, and the margin must be real
(not accumulation-order noise). Reference behavior: the sv4 variant's
quality-vs-fps deliverable (HelloPathtracing_sv4_vmv23/SimplePathtracer.cpp
:135-215 final_fps.dat columns).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from golden_scenes import _cam, _open_scene, _sky_probe
from optixpathtracer_tpu.builder import compile_scene
from optixpathtracer_tpu.engine.adaptive import AdaptiveRenderer
from optixpathtracer_tpu.engine.renderer import Renderer
from optixpathtracer_tpu.engine.wavefront import RenderConfig
from optixpathtracer_tpu.ops.denoise import atrous_denoise

W, H = 64, 48


def _denoised_image(ar):
    """The bench's pipeline image: scatter the adaptive tile rows back to
    the frame, then demodulated variance-guided A-Trous (bench.py
    quality_track rmse_pipeline, measured-best denoiser config)."""
    yx_np = np.asarray(ar._py) * W + np.asarray(ar._px)
    yx = jnp.asarray(np.where(np.asarray(ar._valid), yx_np, W * H))
    nf1 = jnp.maximum(ar.count.astype(jnp.float32), 1.0)
    nf = nf1[:, None]

    def img(v):
        rows = jnp.stack([v.x, v.y, v.z], -1) / nf
        buf = jnp.zeros((W * H + 1, 3), jnp.float32).at[yx].set(
            rows, mode="promise_in_bounds")
        return buf[: W * H].reshape(H, W, 3)

    mean_l = ar.lum_sum / nf1
    var = jnp.maximum(ar.lum2_sum / nf1 - mean_l * mean_l, 0.0) / nf1
    vbuf = jnp.zeros((W * H + 1,), jnp.float32).at[yx].set(
        var, mode="promise_in_bounds")
    dn = atrous_denoise(img(ar.col_sum), img(ar.nrm_sum), img(ar.alb_sum),
                        sigma_color=4.0, sigma_albedo=1.0,
                        variance=vbuf[: W * H].reshape(H, W),
                        var_boost=256.0, demodulate=True)
    return np.asarray(dn)


def test_composed_pipeline_beats_uniform_at_equal_budget():
    hs = _open_scene()
    cs = compile_scene(hs)
    probe = _sky_probe()
    cfg = RenderConfig(width=W, height=H, samples_per_launch=2, max_depth=3,
                       clamp_radiance=1e30)
    cam = _cam((3, 2, 4), (0, 0.4, 0))
    cam.aspect_ratio = W / H

    # converged reference: 64-spp uniform
    ref = Renderer(cs, probe,
                   dataclasses.replace(cfg, samples_per_launch=8), cam)
    for _ in range(8):
        ref.render(download=False)
    ref_img = ref.accum_image()

    acfg = dataclasses.replace(cfg, sampling="sobol")
    ar = AdaptiveRenderer(cs, probe, acfg, cam, warmup_spp=2, refine_spp=4,
                          refine_fraction=0.25)
    for _ in range(3):
        ar.render()
    n_composed = ar.stats()["total_samples"]

    uni = Renderer(cs, probe, cfg, cam)
    launches = -(-n_composed // (W * H * cfg.samples_per_launch))
    for _ in range(launches):
        uni.render(download=False)
    assert launches * W * H * cfg.samples_per_launch >= n_composed

    def rmse(img):
        return float(np.sqrt(np.mean((img - ref_img) ** 2)))

    r_composed = rmse(_denoised_image(ar))
    r_uniform = rmse(uni.accum_image())
    assert r_composed < 0.8 * r_uniform, (
        f"composed sobol+adaptive+denoise {r_composed:.5f} "
        f"(n={n_composed}) should beat uniform {r_uniform:.5f} "
        f"by a real margin"
    )
