"""Shared path-tracing core used by pt / gpt / mcmc / aov.

TPU-native redesign of the reference's megakernel PathTracerBase
(crates/akari_integrator/src/pt.rs:94-901): instead of one GPU thread per
pixel running a divergent loop, a whole batch of N lanes steps through the
bounce loop together; dead lanes are masked. The loop is unrolled at trace
time (static max_depth, like the reference's traced kernel) so XLA fuses each
bounce into a handful of kernels.

Per-bounce sample consumption matches pt.rs exactly (camera 2D; per bounce:
3D light + 3D bsdf + 1D RR) so sample-replay integrators (MCMC, GPT) can
reuse this core with a replayed sampler.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp

from ..core.math import RAY_TMAX, dot, face_forward, normalize, offset_ray_origin
from ..core.sampling import mis_weight
from ..accel.trace import intersect_brute_force, occlude_brute_force
from ..lights import finish_light_sample, pdf_direct, sample_light_point
from ..scene import Scene


@dataclass
class PTSettings:
    max_depth: int = 7
    rr_depth: int = 5
    use_nee: bool = True
    indirect_only: bool = False
    force_diffuse: bool = False
    clamp_indirect: float = 1000.0


def _select_by_kind(scene: Scene, si, fn):
    """Evaluate fn(closure) for each shader kind, blend by kind mask.

    fn returns a pytree of arrays [N, ...]; results are jnp.where-selected.
    The lax.switch-free analog of dispatch_surface (eval.rs:444-466)."""
    out = None
    for mask, closure in scene.dispatch_closures(si):
        res = fn(closure)
        if out is None:
            out = res
        else:
            out = _tree_select(mask, res, out)
    return out


def _tree_select(mask, a, b):
    import jax

    def sel(x, y):
        m = mask
        while m.ndim < x.ndim:
            m = m[..., None]
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(sel, a, b)


def trace_paths(
    scene: Scene,
    settings: PTSettings,
    ray_o,
    ray_d,
    sampler,
    radiance_cb: Callable | None = None,
):
    """Trace one bounce-limited path per lane; returns (radiance [N,3], aux).

    sampler: object with next_1d/next_2d/next_3d returning (sampler, value).
    radiance_cb: optional hook(depth, contribution) for GPT gradient taps.
    """
    a = scene.arrays
    n = ray_o.shape[0]
    radiance = jnp.zeros((n, 3))
    beta = jnp.ones((n, 3))
    active = jnp.ones((n,), bool)
    prev_bsdf_pdf = jnp.zeros((n,))
    prev_ng = jnp.zeros((n, 3))
    exclude = jnp.full((n,), -1, jnp.int32)
    tmin = jnp.zeros((n,))
    first_hit_albedo = jnp.zeros((n, 3))
    first_hit_normal = jnp.zeros((n, 3))
    first_hit_t = jnp.full((n,), RAY_TMAX)
    base_replay_throughput = jnp.zeros((n, 3))

    for depth in range(settings.max_depth + 1):
        tmax = jnp.full((n,), RAY_TMAX)
        hit = intersect_brute_force(
            ray_o, ray_d, tmin, tmax, a.v0, a.e1, a.e2, exclude0=exclude
        )
        lane_hit = active & hit.valid
        # (no envmap: reference hit_envmap returns zero, pt.rs:225-228)
        active = lane_hit
        si = scene.surface_interaction(jnp.maximum(hit.tri_id, 0), hit.bary)
        wo = -ray_d

        if depth == 0:
            first_hit_normal = jnp.where(lane_hit[..., None], si["ng"], 0.0)
            first_hit_t = jnp.where(lane_hit, hit.t, RAY_TMAX)

        # --- surface light hit + MIS (pt.rs:230-258) ---
        tri_light = a.lights.tri_light_id[si["tri_id"]]
        is_light = lane_hit & (tri_light >= 0)
        if (not settings.indirect_only) or depth > 1:
            le = _select_by_kind(scene, si, lambda c: c.emission(wo))
            front = dot(si["ng"], ray_d) < 0.0
            le = jnp.where((is_light & front)[..., None], le, 0.0)
            if depth == 0 or not settings.use_nee:
                w = jnp.ones((n,))
            else:
                lpdf = pdf_direct(a.lights, si["tri_id"], si["area"], si["ng"], si["p"], ray_o)
                w = mis_weight(prev_bsdf_pdf, lpdf)
            contrib = beta * le * w[..., None]
            radiance = radiance + jnp.where(active[..., None], contrib, 0.0)
            if radiance_cb is not None:
                radiance_cb(depth, "emission", contrib, active)
        if depth == 0:
            base_replay_throughput = radiance

        if depth >= settings.max_depth:
            break
        # depth += 1 happens implicitly: from here on "depth" in reference
        # terms is depth+1 (pt.rs:468)
        cur_depth = depth + 1

        # --- NEE (pt.rs:470-478, 170-209) ---
        sampler, u_light = sampler.next_3d()
        nee_enabled = settings.use_nee and (
            (not settings.indirect_only) or cur_depth > 1
        )
        has_lights = a.lights.num_lights > 0
        if nee_enabled and has_lights:
            light, lc_pdf, ltri, lprim_pdf, lbary = sample_light_point(
                a.lights, a, u_light[..., 0], u_light[..., 1:]
            )
            lsi = scene.surface_interaction(ltri, lbary)
            ls = finish_light_sample(
                lc_pdf,
                lprim_pdf,
                ltri,
                lbary,
                jnp.zeros((n, 3)),  # li filled below (needs wi)
                lsi["p"],
                lsi["ng"],
                lsi["area"],
                si["p"],
                si["ng"],
            )
            # emission toward the receiver: direction = -wi (area.rs:83-84)
            l_emission = _select_by_kind(scene, lsi, lambda c: c.emission(-ls.wi))
            front = dot(ls.wi, lsi["ng"]) < 0.0
            li = jnp.where(front[..., None], l_emission, 0.0)
            ls = ls._replace(li=li)
            light_valid = ls.valid & active
        else:
            ls = None
            light_valid = jnp.zeros((n,), bool)

        # --- BSDF sample + direct shading (pt.rs:296-323) ---
        sampler, u_bsdf = sampler.next_3d()

        def shade(closure):
            out = {}
            if ls is not None:
                f_l, pdf_l = closure.evaluate(wo, ls.wi)
                w = mis_weight(ls.pdf, pdf_l)
                out["direct"] = (
                    ls.li * f_l * (w / jnp.maximum(ls.pdf, 1e-20))[..., None]
                )
            s = closure.sample(wo, u_bsdf[..., 0], u_bsdf[..., 1:])
            out["wi"] = s["wi"]
            out["f"] = s["f"]
            out["pdf"] = s["pdf"]
            out["valid"] = s["valid"]
            out["roughness"] = closure.roughness(wo, u_bsdf[..., 0])
            out["albedo"] = closure.albedo(wo)
            return out

        sh = _select_by_kind(scene, si, shade)
        if depth == 0:
            first_hit_albedo = jnp.where(lane_hit[..., None], sh["albedo"], 0.0)

        # --- shadow ray + add direct (pt.rs:504-513) ---
        if ls is not None:
            occluded = occlude_brute_force(
                ls.shadow_ro,
                ls.wi,
                jnp.zeros((n,)),
                ls.shadow_dist,
                a.v0,
                a.e1,
                a.e2,
                exclude0=si["tri_id"].astype(jnp.int32),
                exclude1=ls.dest_tri,
            )
            direct_ok = light_valid & ~occluded
            contrib = beta * sh["direct"]
            radiance = radiance + jnp.where(direct_ok[..., None], contrib, 0.0)
            if radiance_cb is not None:
                radiance_cb(cur_depth, "nee", contrib, direct_ok)

        # --- continue path (pt.rs:778-866) ---
        sample_ok = sh["valid"] & (sh["pdf"] > 0.0) & (jnp.min(sh["f"], -1) >= 0.0)
        active = active & sample_ok
        beta = beta * jnp.where(
            active[..., None], sh["f"] / jnp.maximum(sh["pdf"], 1e-20)[..., None], 1.0
        )

        # russian roulette (pt.rs:210-224, 843-850)
        sampler, u_rr = sampler.next_1d()
        if cur_depth > settings.rr_depth:
            cont_prob = jnp.clip(jnp.max(beta, -1), 0.0, 1.0) * 0.95
            kill = u_rr >= cont_prob
            active = active & ~kill
            beta = beta / jnp.maximum(cont_prob, 1e-20)[..., None]

        prev_bsdf_pdf = sh["pdf"]
        prev_ng = si["ng"]
        ray_o = offset_ray_origin(si["p"], face_forward(si["ng"], sh["wi"]))
        ray_d = sh["wi"]
        exclude = si["tri_id"].astype(jnp.int32)

    # indirect clamping (pt.rs:871-876, default clamp 1000)
    if settings.clamp_indirect > 0.0:
        indirect = radiance - base_replay_throughput
        indirect = jnp.clip(indirect, None, settings.clamp_indirect)
        radiance = base_replay_throughput + indirect

    aux = {
        "albedo": first_hit_albedo,
        "normal": first_hit_normal,
        "first_t": first_hit_t,
    }
    return radiance, aux, sampler
