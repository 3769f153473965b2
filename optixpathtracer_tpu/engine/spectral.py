"""Hero-wavelength spectral path tracer (configs sv3/sv4's intended mode).

The reference ships spectrum.h but never wires it in (no include, SURVEY.md
§2 'Spectral rendering support'); this engine actually renders spectrally:
each path carries a (N_HERO,) spectral throughput at a hero wavelength + 3
rotated companions, reflectances are evaluated analytically via the Smits
basis (core/spectrum.py), and samples resolve to linear sRGB through the CIE
curves at the end of every path — the full spectral loop the reference
sketched.

Engine structure mirrors engine/wavefront.py (probe NEE with MIS + Disney
continuation) with a spectral twist: the Disney eval is jointly AFFINE in
(albedo, cspec0) — the only non-affine albedo path is the ctint
normalization inside cspec0 (shade/disney.py bsdf_eval) — so THREE
overridden evals reconstruct the exact per-wavelength BSDF:
  f(lambda) = S[f00](lambda)                                  # chromatic base
            + (f10 - f00) * S_albedo(lambda)                  # diffuse slope
            + (f01 - f00) * cspec0(lambda)                    # specular slope
with f00 = f(albedo=0, cspec0=0), f10 = f(albedo=1, cspec0=0),
f01 = f(albedo=0, cspec0=1); cspec0(lambda) rebuilds the Disney specular
color per wavelength from the spectralized RGB tint, and the chromatic base
(the subsurface sqrt(color) term) is spectralized via the same Smits basis.
Exact (to the basis metamerism every RGB->spectral uplift carries) for the
FULL material set — metallic, specular-tinted, transmissive, subsurface
(tests/test_spectral_engine.py pins tinted-metal spectral == RGB render).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..builder import CompiledScene
from ..core.math import Vec3, basis_from_vector, dot, normalize, where
from ..core.rng import RngState, randf, tea
from ..core.spectrum import (
    N_HERO,
    rgb_to_spectrum,
    sample_hero_wavelengths,
    spectral_to_rgb_calibrated,
)
from ..lights.probe import Probe, dir_to_uv, probe_eval, probe_sample
from ..shade import disney
from .wavefront import CameraParams, RenderConfig, _any_hit, _closest_hit, _hit_geometry

Array = jax.Array


def trace_spectral(
    cs: CompiledScene,
    probe: Probe,
    cfg: RenderConfig,
    cam: CameraParams,
    pixel_x: Array,
    pixel_y: Array,
    subframe: Array,
) -> Vec3:
    """Render cfg.samples_per_launch spectral paths/pixel -> linear RGB sum."""
    n = pixel_x.shape[0]
    w = jnp.float32(cfg.width)
    h = jnp.float32(cfg.height)
    pix = (pixel_y * cfg.width + pixel_x).astype(jnp.uint32)
    zf = pixel_x.astype(jnp.float32) * 0.0
    zero = Vec3(zf, zf, zf)

    def sample_body(s, acc):
        state = RngState.seed(tea(pix, subframe.astype(jnp.uint32) * cfg.samples_per_launch + s))
        state, jx = randf(state)
        state, jy = randf(state)
        state, ul = randf(state)
        lam = sample_hero_wavelengths(ul)  # (N, 4)

        dx = 2.0 * (pixel_x.astype(jnp.float32) + jx) / w - 1.0
        dy = 2.0 * (pixel_y.astype(jnp.float32) + jy) / h - 1.0
        d = normalize(cam.u * dx + cam.v * dy + cam.w * 1.0)
        o = Vec3(cam.eye.x + zf, cam.eye.y + zf, cam.eye.z + zf)

        bu, bv = dir_to_uv(d)
        backplate = probe_eval(probe, bu, bv)

        path = dict(
            o=o,
            d=d,
            tp=jnp.ones((n, N_HERO)) + zf[:, None],
            eta=zf + 1.0,
            rad=jnp.zeros((n, N_HERO)) + zf[:, None],
            alpha=zf,
            done=zf > 1.0,
            secondary=zf > 1.0,
            state=state,
        )

        def bounce(depth, path):
            active = ~path["done"]
            t_max = jnp.where(active, cfg.t_max, 0.0)
            rec = _closest_hit(cs, cfg, path["o"], path["d"], cfg.t_min, t_max)
            hit = rec.hit & active
            n_hit, mat, albedo, _ = _hit_geometry(cs, rec, path["d"], cfg.use_shading_normals)
            p_hit = path["o"] + path["d"] * rec.t
            s_alb = rgb_to_spectrum(albedo, lam)  # (N, 4)

            # per-wavelength Disney specular color: spectralize the RGB tint
            # (the one non-affine albedo term) and rebuild cspec0(lambda)
            cd_lum = 0.3 * albedo.x + 0.6 * albedo.y + 0.1 * albedo.z
            ctint = where(
                cd_lum > 0.0, albedo * (1.0 / jnp.maximum(cd_lum, 1e-8)),
                Vec3.ones((n,)),
            )
            s_tint = rgb_to_spectrum(ctint, lam)
            base_spec = (mat.specular * 0.08 * (1.0 - mat.metallic))[:, None]
            s_cspec = (
                (1.0 + (s_tint - 1.0) * mat.specular_tint[:, None]) * base_spec
                + mat.metallic[:, None] * s_alb
            )
            zero3 = Vec3.zeros((n,))
            one3 = Vec3.ones((n,))

            def eval_spectral(wi_dir):
                """Exact per-wavelength BSDF via the joint-affine split."""
                f00 = disney.bsdf_eval(mat, zero3, path["eta"], eta_o, n_hit,
                                       wo, wi_dir, cspec0_override=zero3)
                f10 = disney.bsdf_eval(mat, one3, path["eta"], eta_o, n_hit,
                                       wo, wi_dir, cspec0_override=zero3)
                f01 = disney.bsdf_eval(mat, zero3, path["eta"], eta_o, n_hit,
                                       wo, wi_dir, cspec0_override=one3)
                # chromatic base: the subsurface sqrt(color) backside term
                s_f00 = rgb_to_spectrum(f00, lam)
                return (s_f00 + (f10.x - f00.x)[:, None] * s_alb
                        + (f01.x - f00.x)[:, None] * s_cspec)

            eta_o = jnp.where(path["eta"] == 1.0, mat.index_of_refraction(), 1.0)
            wo = -path["d"]

            # --- NEE with MIS (spectral sky via Smits basis) ---
            state, wi, sky_rgb, sky_pdf = probe_sample(probe, path["state"])
            occ_tmax = jnp.where(hit, cfg.t_max, 0.0)
            occluded = _any_hit(cs, cfg, p_hit, wi, cfg.shadow_t_min, occ_tmax)
            b_pdf = disney.bsdf_pdf(mat, path["eta"], eta_o, n_hit, wo, wi)
            f_l = eval_spectral(wi)
            weight = 0.5 * sky_pdf / jnp.maximum(0.5 * b_pdf + 0.5 * sky_pdf, 1e-12)
            s_sky = rgb_to_spectrum(sky_rgb, lam)
            valid = hit & ~occluded & (b_pdf > 0) & (sky_pdf > 0) & (weight > 0)
            contrib = s_sky * f_l * (
                weight * jnp.abs(dot(wi, n_hit)) / jnp.maximum(sky_pdf, 1e-12)
            )[:, None]
            rad = path["rad"] + jnp.where(valid[:, None], path["tp"] * contrib, 0.0)
            alpha = jnp.where(hit, 1.0, path["alpha"])

            # emission on primary hits
            s_emit = rgb_to_spectrum(mat.emission, lam)
            rad = rad + jnp.where(
                (hit & ~path["secondary"])[:, None], path["tp"] * s_emit, 0.0
            )

            # --- Disney continuation ---
            tb, bb = basis_from_vector(n_hit)
            state, res = disney.bsdf_sample(mat, path["eta"], eta_o, tb, bb, n_hit, wo, state)
            g_l = eval_spectral(res.light)
            cos_t = jnp.abs(dot(n_hit, res.light))
            cont = hit & (res.pdf > 0.0)
            tp = jnp.where(
                cont[:, None],
                path["tp"] * g_l * (cos_t / jnp.maximum(res.pdf, 1e-12))[:, None],
                path["tp"],
            )
            transmit = dot(res.light, n_hit) <= 0.0
            eta = jnp.where(cont & transmit, eta_o, path["eta"])
            done = path["done"] | (active & ~rec.hit) | (hit & (res.pdf <= 0.0))

            return dict(
                o=where(cont, p_hit, path["o"]),
                d=where(cont, res.light, path["d"]),
                tp=tp,
                eta=eta,
                rad=rad,
                alpha=alpha,
                done=done,
                secondary=path["secondary"] | cont,
                state=state,
            )

        path = jax.lax.fori_loop(0, cfg.max_depth + 1, bounce, path)

        rgb = spectral_to_rgb_calibrated(path["rad"], lam)
        # composite over the RGB backplate by coverage (reference semantics)
        a = path["alpha"]
        out = backplate * (1.0 - a) + rgb
        return (acc[0] + out, acc[1] + Vec3(a, a, a))

    color, alpha = jax.lax.fori_loop(
        0, cfg.samples_per_launch, sample_body, (zero, zero)
    )
    return color  # per-pixel sum over spp (divide by spp to average)


@dataclasses.dataclass
class SpectralRenderer:
    """Progressive spectral renderer (same API shape as engine.Renderer)."""

    def __init__(self, cs: CompiledScene, probe: Probe, config: RenderConfig, camera):
        import numpy as np

        self.cs = cs
        self.probe = probe
        self.config = config
        self.camera = camera
        n = config.width * config.height
        ys, xs = np.divmod(np.arange(n, dtype=np.int32), config.width)
        self._px = jnp.asarray(xs)
        self._py = jnp.asarray(ys)
        self.accum = Vec3.zeros((n,))
        self.subframe_index = 0
        self._step = jax.jit(
            lambda cam, sub: trace_spectral(
                self.cs, self.probe, self.config, cam, self._px, self._py, sub
            )
        )

    def render(self):
        import numpy as np

        cam = CameraParams.from_camera(self.camera)
        out = self._step(cam, jnp.uint32(self.subframe_index))
        spp = self.config.samples_per_launch
        cur = out * (1.0 / spp)
        a = 1.0 / (self.subframe_index + 1.0)
        self.accum = self.accum + (cur - self.accum) * a if self.subframe_index else cur
        self.subframe_index += 1
        h, wd = self.config.height, self.config.width
        img = np.stack(
            [np.asarray(self.accum.x), np.asarray(self.accum.y), np.asarray(self.accum.z)], -1
        )
        return img.reshape(h, wd, 3)[::-1]
