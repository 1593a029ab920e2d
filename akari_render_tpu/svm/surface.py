"""Surface (BSDF) combinator tree, batched over shading lanes.

This mirrors the reference's two-staged closure design exactly
(crates/akari_render/src/svm/surface/mod.rs): the tree STRUCTURE is built at
Python trace time per shader kind (polymorphism by compile-time enumeration),
while every method is a batched jnp computation over all lanes. jit tracing
plays the role LuisaCompute kernel tracing plays in the reference.

Conventions (identical to the reference Surface trait, surface/mod.rs:53-162):
- local shading space, +z = shading normal
- evaluate(wo, wi) returns (f * |cos_theta(wi)|, pdf)
- sample_wi returns (wi, valid); pdf comes from a follow-up evaluate
- colors are [N, 3] linear RGB in the working colorspace
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import Frame, face_forward, normalize, reflect, refract
from ..core.sampling import (
    INV_PI,
    PI,
    cos_sample_hemisphere,
    weighted_discrete_choice2_and_remap,
)
from .microfacet import TrowbridgeReitz, fr_complex, fr_dielectric


def _b(x):
    """Broadcast scalar-ish to color [..., 3]."""
    x = jnp.asarray(x)
    if x.ndim == 0 or x.shape[-1] != 3:
        x = x[..., None] * jnp.ones(3)
    return x


class Surface:
    """Base: zero response."""

    def evaluate(self, wo, wi):
        z = jnp.zeros(wo.shape[:-1])
        return jnp.zeros_like(wo), z

    def sample_wi(self, wo, u_select, u_sample):
        return jnp.zeros_like(wo), jnp.zeros(wo.shape[:-1], bool)

    def albedo(self, wo):
        return jnp.zeros_like(wo)

    def emission(self, wo):
        return jnp.zeros_like(wo)

    def roughness(self, wo, u_select):
        return jnp.ones(wo.shape[:-1])

    def alpha(self, shape):
        return jnp.ones(shape)

    def ns(self, shape):
        return jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), shape + (3,))


class NullSurface(Surface):
    pass


class DiffuseBsdf(Surface):
    """Lambert; `reflectance` is pre-divided by pi (ref diffuse.rs:13-104)."""

    def __init__(self, reflectance):
        self.reflectance = reflectance

    def evaluate(self, wo, wi):
        same = Frame.same_hemisphere(wo, wi)
        cos_i = Frame.abs_cos_theta(wi)
        pdf = jnp.where(same, cos_i * INV_PI, 0.0)
        f = jnp.where(same[..., None], self.reflectance * cos_i[..., None], 0.0)
        return f, pdf

    def sample_wi(self, wo, u_select, u_sample):
        wi = cos_sample_hemisphere(u_sample)
        wi = jnp.where(Frame.same_hemisphere(wo, wi)[..., None], wi, -wi)
        return wi, jnp.ones(wo.shape[:-1], bool)

    def albedo(self, wo):
        return self.reflectance * PI

    def roughness(self, wo, u_select):
        return jnp.ones(wo.shape[:-1])


class MicrofacetReflection(Surface):
    """GGX reflection lobe (surface/mod.rs:820-900)."""

    def __init__(self, color, fresnel, dist: TrowbridgeReitz):
        self.color = color
        self.fresnel = fresnel  # callable cos_theta_i -> [N, 3]
        self.dist = dist

    def evaluate(self, wo, wi):
        wh = wo + wi
        cos_o = Frame.cos_theta(wo)
        cos_i = Frame.cos_theta(wi)
        degenerate = (
            (jnp.sum(wh * wo, -1) * jnp.sum(wi * wh, -1) < 0.0)
            | jnp.all(wh == 0.0, -1)
            | (cos_i == 0.0)
            | (cos_o == 0.0)
            | ~Frame.same_hemisphere(wo, wi)
        )
        wh = normalize(wh)
        z_axis = jnp.zeros_like(wh).at[..., 2].set(1.0)
        f_cos = self.fresnel(jnp.sum(wi * face_forward(wh, z_axis), -1))
        d = self.dist.d(wh)
        g = self.dist.g(wo, wi)
        denom = cos_i * cos_o
        f = (
            self.color
            * f_cos
            * jnp.abs(0.25 * d * g / jnp.where(denom == 0, 1.0, denom))[..., None]
            * jnp.abs(cos_i)[..., None]
        )
        pdf = self.dist.pdf(wo, wh) / jnp.maximum(4.0 * jnp.abs(jnp.sum(wo * wh, -1)), 1e-12)
        return (
            jnp.where(degenerate[..., None], 0.0, f),
            jnp.where(degenerate, 0.0, pdf),
        )

    def sample_wi(self, wo, u_select, u_sample):
        wh = self.dist.sample_wh(wo, u_sample)
        wi = reflect(wo, wh)
        return wi, Frame.same_hemisphere(wo, wi)

    def albedo(self, wo):
        return self.color

    def roughness(self, wo, u_select):
        return jnp.broadcast_to(self.dist.roughness, wo.shape[:-1])


class MicrofacetTransmission(Surface):
    """GGX transmission lobe (surface/mod.rs:902-1006)."""

    def __init__(self, color, eta, fresnel, dist: TrowbridgeReitz):
        self.color = color
        self.eta = eta  # [N] relative IOR (t/i for outward-facing wo)
        self.fresnel = fresnel
        self.dist = dist

    def evaluate(self, wo, wi):
        cos_o = Frame.cos_theta(wo)
        cos_i = Frame.cos_theta(wi)
        eta = jnp.where(cos_o > 0.0, self.eta, 1.0 / self.eta)
        wh = normalize(wo + wi * eta[..., None])
        z_axis = jnp.zeros_like(wh).at[..., 2].set(1.0)
        wh = face_forward(wh, z_axis)
        backfacing = (jnp.sum(wh * wi, -1) * cos_i < 0.0) | (jnp.sum(wh * wo, -1) * cos_o < 0.0)
        invalid = (
            (jnp.sum(wh * wo, -1) * jnp.sum(wi * wh, -1) > 0.0)
            | (cos_i == 0.0)
            | (cos_o == 0.0)
            | backfacing
            | Frame.same_hemisphere(wo, wi)
        )
        f_cos = self.fresnel(jnp.sum(wo * wh, -1))
        denom = (jnp.sum(wi * wh, -1) + jnp.sum(wo * wh, -1) / eta) ** 2 * cos_i * cos_o
        d = self.dist.d(wh)
        g = self.dist.g(wo, wi)
        mag = jnp.abs(
            d * g / jnp.maximum(eta**2, 1e-12) * jnp.abs(jnp.sum(wi * wh, -1)) * jnp.abs(jnp.sum(wo * wh, -1))
            / jnp.where(denom == 0.0, 1.0, denom)
        ) * jnp.abs(cos_i)
        f = (1.0 - f_cos) * self.color * mag[..., None]
        f = jnp.where((denom == 0.0)[..., None], 0.0, f)
        pdf_denom = (jnp.sum(wi * wh, -1) + jnp.sum(wo * wh, -1) / eta) ** 2
        dwh_dwi = jnp.abs(jnp.sum(wi * wh, -1)) / jnp.maximum(pdf_denom, 1e-20)
        pdf = jnp.where(pdf_denom == 0.0, 0.0, self.dist.pdf(wo, wh) * dwh_dwi)
        return (
            jnp.where(invalid[..., None], 0.0, f),
            jnp.where(invalid, 0.0, pdf),
        )

    def sample_wi(self, wo, u_select, u_sample):
        wh = self.dist.sample_wh(wo, u_sample)
        ok, _, wi = refract(wo, wh, self.eta)
        return wi, ok & ~Frame.same_hemisphere(wo, wi)

    def albedo(self, wo):
        return self.color

    def roughness(self, wo, u_select):
        return jnp.broadcast_to(self.dist.roughness, wo.shape[:-1])


class EmissiveSurface(Surface):
    """Adds emission on top of an optional inner BSDF (surface/mod.rs:330-411)."""

    def __init__(self, inner: Surface | None, emission):
        self.inner = inner
        self._emission = emission

    def evaluate(self, wo, wi):
        if self.inner is None:
            return super().evaluate(wo, wi)
        return self.inner.evaluate(wo, wi)

    def sample_wi(self, wo, u_select, u_sample):
        if self.inner is None:
            return super().sample_wi(wo, u_select, u_sample)
        return self.inner.sample_wi(wo, u_select, u_sample)

    def albedo(self, wo):
        return self.inner.albedo(wo) if self.inner else jnp.zeros_like(wo)

    def roughness(self, wo, u_select):
        return self.inner.roughness(wo, u_select) if self.inner else jnp.ones(wo.shape[:-1])

    def emission(self, wo):
        e = _b(self._emission) * jnp.ones_like(wo)
        return e + self.inner.emission(wo) if self.inner else e

    def alpha(self, shape):
        return self.inner.alpha(shape) if self.inner else jnp.ones(shape)

    def ns(self, shape):
        return self.inner.ns(shape) if self.inner else super().ns(shape)


class ScaledBsdf(Surface):
    def __init__(self, inner: Surface, weight_fn):
        self.inner = inner
        self.weight_fn = weight_fn  # wo -> [N, 3]

    def evaluate(self, wo, wi):
        f, pdf = self.inner.evaluate(wo, wi)
        return f * self.weight_fn(wo), pdf

    def sample_wi(self, wo, u_select, u_sample):
        return self.inner.sample_wi(wo, u_select, u_sample)

    def albedo(self, wo):
        return self.inner.albedo(wo) * self.weight_fn(wo)

    def emission(self, wo):
        return self.inner.emission(wo) * self.weight_fn(wo)

    def roughness(self, wo, u_select):
        return self.inner.roughness(wo, u_select)

    def alpha(self, shape):
        return self.inner.alpha(shape)

    def ns(self, shape):
        return self.inner.ns(shape)


class BsdfMixture(Surface):
    """Two-lobe blend (surface/mod.rs:568-695).

    mode 'add': f = fa + fb, pdf lerped by frac (frac = MIS select weight).
    mode 'mix': linear interpolation by frac; frac selects b.
    """

    def __init__(self, frac_fn, bsdf_a: Surface, bsdf_b: Surface, mode: str):
        assert mode in ("add", "mix")
        self.frac_fn = frac_fn  # wo -> [N]
        self.a = bsdf_a
        self.b = bsdf_b
        self.mode = mode

    def evaluate(self, wo, wi):
        frac = self.frac_fn(wo)
        fa, pa = self.a.evaluate(wo, wi)
        fb, pb = self.b.evaluate(wo, wi)
        pdf = pa + (pb - pa) * frac
        if self.mode == "add":
            return fa + fb, pdf
        return fa + (fb - fa) * frac[..., None], pdf

    def sample_wi(self, wo, u_select, u_sample):
        frac = self.frac_fn(wo)
        pick_b, remapped = weighted_discrete_choice2_and_remap(frac, u_select)
        wa, va = self.a.sample_wi(wo, remapped, u_sample)
        wb, vb = self.b.sample_wi(wo, remapped, u_sample)
        wi = jnp.where(pick_b[..., None], wb, wa)
        return wi, jnp.where(pick_b, vb, va)

    def albedo(self, wo):
        frac = self.frac_fn(wo)[..., None]
        aa, ab = self.a.albedo(wo), self.b.albedo(wo)
        if self.mode == "add":
            return aa + ab
        return aa * (1.0 - frac) + ab * frac

    def emission(self, wo):
        frac = self.frac_fn(wo)[..., None]
        ea, eb = self.a.emission(wo), self.b.emission(wo)
        if self.mode == "add":
            return ea + eb
        return ea * (1.0 - frac) + eb * frac

    def roughness(self, wo, u_select):
        frac = self.frac_fn(wo)
        pick_b, remapped = weighted_discrete_choice2_and_remap(frac, u_select)
        ra = self.a.roughness(wo, remapped)
        rb = self.b.roughness(wo, remapped)
        return jnp.where(pick_b, rb, ra)

    def alpha(self, shape):
        return jnp.maximum(self.a.alpha(shape), self.b.alpha(shape))

    def ns(self, shape):
        return normalize(self.a.ns(shape) + self.b.ns(shape))


class ConductorReflection(MicrofacetReflection):
    """Metal GGX lobe whose tint comes entirely from the complex Fresnel —
    albedo reports F(cos_o) so denoising/AOV/GPT heuristics see the metal's
    actual reflectance instead of the white lobe color."""

    def albedo(self, wo):
        return self.fresnel(Frame.abs_cos_theta(wo))


def fr_dielectric_integral(eta):
    """Hemispherical (diffuse) Fresnel reflectance Fdr(eta), the polynomial
    fits of surface/mod.rs:1127-1144. eta: [N]."""
    lt = eta * (eta * (eta * -0.90663979 + 2.23559031) + -2.09069066) + 0.75985009
    inv = 1.0 / jnp.maximum(eta, 1e-6)
    gt = inv * (inv * -1.18995376 + 0.21762732) + 0.97945724
    out = jnp.where(eta < 1.0, lt, gt)
    return jnp.where(eta == 1.0, 0.0, out)


class PlasticBsdf(Surface):
    """Tungsten-style rough plastic with internal scattering
    (ref svm/surface/plastic.rs:38-178, after Bitterli's RoughPlasticBsdf):
    a dielectric GGX coat over a diffuse substrate whose response is scaled
    by both-way Fresnel transmission (1-Fi)(1-Fo), the 1/eta^2 radiance
    compression, the multiple-scattering compensation kd/(1 - kd*Fdr), and
    the absorption term a = exp(-sigma_a*thickness*(1/cos_i + 1/cos_o))."""

    def __init__(self, kd, eta, roughness, sigma_a=None, thickness=None):
        from ..core.color import luminance
        from .microfacet import TrowbridgeReitz, fr_dielectric

        n = kd.shape[:-1]
        sigma_a = jnp.zeros(n + (3,)) if sigma_a is None else sigma_a
        thickness = jnp.ones(n) if thickness is None else thickness
        fdr = fr_dielectric_integral(eta)
        self.substrate = DiffuseBsdf(
            kd / jnp.maximum(1.0 - kd * fdr[..., None], 1e-4) * INV_PI
        )
        dist = TrowbridgeReitz.from_roughness(roughness)
        self._fr = lambda c: fr_dielectric(c, eta)
        fresnel3 = lambda c: self._fr(c)[..., None] * jnp.ones(3)
        self.coat = MicrofacetReflection(jnp.ones(n + (3,)), fresnel3, dist)
        self.eta = eta
        self.sigma_a = sigma_a * thickness[..., None]
        avg_transmittance = jnp.exp(-2.0 * luminance(sigma_a) * thickness)
        self.kd_weight = luminance(kd) * avg_transmittance

    def _substrate_weight(self, fo):
        w = self.kd_weight * (1.0 - fo)
        return jnp.where(w == 0.0, 0.0, w / jnp.maximum(w + fo, 1e-20))

    def evaluate(self, wo, wi):
        f_coat, pdf_coat = self.coat.evaluate(wo, wi)
        fi = self._fr(Frame.abs_cos_theta(wi))
        fo = self._fr(Frame.abs_cos_theta(wo))
        a = jnp.exp(
            -self.sigma_a
            * (
                1.0 / jnp.maximum(Frame.abs_cos_theta(wi), 1e-6)
                + 1.0 / jnp.maximum(Frame.abs_cos_theta(wo), 1e-6)
            )[..., None]
        )
        f_sub, pdf_sub = self.substrate.evaluate(wo, wi)
        scale = ((1.0 - fi) * (1.0 - fo) / jnp.maximum(self.eta**2, 1e-6))[..., None]
        f = f_coat + f_sub * scale * a
        w = self._substrate_weight(fo)
        pdf = pdf_coat * (1.0 - w) + pdf_sub * w
        return f, pdf

    def sample_wi(self, wo, u_select, u_sample):
        fo = self._fr(Frame.abs_cos_theta(wo))
        w = self._substrate_weight(fo)
        pick_sub, remapped = weighted_discrete_choice2_and_remap(w, u_select)
        ws, vs = self.substrate.sample_wi(wo, remapped, u_sample)
        wc, vc = self.coat.sample_wi(wo, remapped, u_sample)
        return (
            jnp.where(pick_sub[..., None], ws, wc),
            jnp.where(pick_sub, vs, vc),
        )

    def albedo(self, wo):
        fo = self._fr(Frame.abs_cos_theta(wo))
        w = self._substrate_weight(fo)
        return (
            self.coat.albedo(wo) * (1.0 - w)[..., None]
            + self.substrate.albedo(wo) * w[..., None]
        )

    def roughness(self, wo, u_select):
        fo = self._fr(Frame.abs_cos_theta(wo))
        w = self._substrate_weight(fo)
        pick_sub, remapped = weighted_discrete_choice2_and_remap(w, u_select)
        return jnp.where(
            pick_sub,
            self.substrate.roughness(wo, remapped),
            self.coat.roughness(wo, remapped),
        )


class CoatedBsdf(Surface):
    """Energy-split layering: top lobe + (1 - E_top) * bottom (surface/mod.rs:476-567)."""

    def __init__(self, top: Surface, bottom: Surface, e_top_fn):
        self.top = top
        self.bottom = bottom
        self.e_top_fn = e_top_fn  # wo -> [N, 3] directional albedo of the top lobe

    def evaluate(self, wo, wi):
        ft, pt = self.top.evaluate(wo, wi)
        fb, pb = self.bottom.evaluate(wo, wi)
        eo = self.e_top_fn(wo)
        ei = self.e_top_fn(wi)
        p_top = jnp.mean(eo, axis=-1)
        pdf = pt * p_top + pb * (1.0 - p_top)
        f = ft + fb * jnp.minimum(1.0 - eo, 1.0 - ei)
        return f, pdf

    def sample_wi(self, wo, u_select, u_sample):
        p_top = jnp.mean(self.e_top_fn(wo), axis=-1)
        pick_top, remapped = weighted_discrete_choice2_and_remap(p_top, u_select)
        wt, vt = self.top.sample_wi(wo, remapped, u_sample)
        wb, vb = self.bottom.sample_wi(wo, remapped, u_sample)
        return (
            jnp.where(pick_top[..., None], wt, wb),
            jnp.where(pick_top, vt, vb),
        )

    def albedo(self, wo):
        eo = self.e_top_fn(wo)
        return self.top.albedo(wo) * eo + self.bottom.albedo(wo) * (1.0 - eo)

    def emission(self, wo):
        eo = self.e_top_fn(wo)
        return self.top.emission(wo) * eo + self.bottom.emission(wo) * (1.0 - eo)

    def roughness(self, wo, u_select):
        p_top = jnp.mean(self.e_top_fn(wo), axis=-1)
        pick_top, remapped = weighted_discrete_choice2_and_remap(p_top, u_select)
        return jnp.where(
            pick_top,
            self.top.roughness(wo, remapped),
            self.bottom.roughness(wo, remapped),
        )

    def alpha(self, shape):
        return self.bottom.alpha(shape)

    def ns(self, shape):
        return self.bottom.ns(shape)


class TransparentSurface(Surface):
    """Alpha-blended pass-through (surface/mod.rs:227-329)."""

    PASS_PDF = 1e16

    def __init__(self, inner: Surface, alpha):
        self.inner = inner
        self._alpha = alpha  # [N]

    def alpha(self, shape):
        return jnp.broadcast_to(self._alpha, shape)

    def evaluate(self, wo, wi):
        f_in, pdf_in = self.inner.evaluate(wo, wi)
        is_pass = jnp.max(jnp.abs(wo + wi), axis=-1) < 6e-7
        a = self._alpha
        pass_f = jnp.ones_like(f_in) * self.PASS_PDF
        # alpha>0: inner (or passthrough spike when 0<alpha<1); alpha==0: pure spike
        f = jnp.where(
            (a > 0.0)[..., None],
            jnp.where(((a < 1.0) & is_pass)[..., None], pass_f, f_in),
            jnp.where(is_pass[..., None], pass_f, 0.0),
        )
        pdf = jnp.where(
            a > 0.0,
            jnp.where((a < 1.0) & is_pass, self.PASS_PDF, pdf_in),
            jnp.where(is_pass, self.PASS_PDF, 0.0),
        )
        return f, pdf

    def sample_wi(self, wo, u_select, u_sample):
        pick_inner, remapped = weighted_discrete_choice2_and_remap(self._alpha, u_select)
        wi_in, v_in = self.inner.sample_wi(wo, remapped, u_sample)
        return (
            jnp.where(pick_inner[..., None], wi_in, -wo),
            jnp.where(pick_inner, v_in, True),
        )

    def albedo(self, wo):
        return self.inner.albedo(wo) * self._alpha[..., None]

    def emission(self, wo):
        return self.inner.emission(wo) * self._alpha[..., None]

    def roughness(self, wo, u_select):
        pick_inner, remapped = weighted_discrete_choice2_and_remap(self._alpha, u_select)
        return jnp.where(pick_inner, self.inner.roughness(wo, remapped), 0.0)

    def ns(self, shape):
        return self.inner.ns(shape)


class SurfaceClosure(Surface):
    """Frame transform + light-leak rejection (surface/mod.rs:697-816).

    Nestable like the reference: the outer closure maps world->shading-local;
    `normal_map` builds an inner closure whose frame lives in the parent's
    local space (surface/mod.rs:1379-1417).
    """

    def __init__(self, inner: Surface, frame, ng):
        self.inner = inner
        self.t, self.b, self.n = frame
        self.ng = ng

    def _valid_wo_wi(self, wo, wi):
        ns, ng = self.n, self.ng
        sign = lambda x: jnp.where(x > 0.0, 1.0, -1.0)
        flipped = sign(jnp.sum(ng * ns, -1))
        return (
            sign(flipped * jnp.sum(wo * ns, -1)) * sign(jnp.sum(wo * ng, -1)) > 0.0
        ) & (sign(flipped * jnp.sum(wi * ns, -1)) * sign(jnp.sum(wi * ng, -1)) > 0.0)

    def _to_local(self, v):
        return Frame.to_local(self.t, self.b, self.n, v)

    def _to_world(self, v):
        return Frame.to_world(self.t, self.b, self.n, v)

    def evaluate(self, wo, wi):
        f, pdf = self.inner.evaluate(self._to_local(wo), self._to_local(wi))
        ok = self._valid_wo_wi(wo, wi)
        return jnp.where(ok[..., None], f, 0.0), jnp.where(ok, pdf, 0.0)

    def sample_wi(self, wo, u_select, u_sample):
        wi_l, valid = self.inner.sample_wi(self._to_local(wo), u_select, u_sample)
        wi = self._to_world(wi_l)
        return wi, valid & self._valid_wo_wi(wo, wi)

    def sample(self, wo, u_select, u_sample):
        """Returns dict(wi, f, pdf, valid) — BsdfSample (surface/mod.rs:793-816)."""
        wi, valid = self.sample_wi(wo, u_select, u_sample)
        f, pdf = self.evaluate(wo, wi)
        valid = valid & (pdf > 0.0)
        return {"wi": wi, "f": f, "pdf": pdf, "valid": valid}

    def albedo(self, wo):
        return self.inner.albedo(self._to_local(wo))

    def emission(self, wo):
        return self.inner.emission(self._to_local(wo))

    def roughness(self, wo, u_select):
        return self.inner.roughness(self._to_local(wo), u_select)

    def alpha(self, shape=None):
        return self.inner.alpha(shape if shape is not None else self.n.shape[:-1])

    def ns(self, shape=None):
        return self._to_world(self.inner.ns(shape if shape is not None else self.n.shape[:-1]))


def frame_from_n_t(n, tt):
    """Frame from normal + tangent hint, Gram-Schmidt with fallback
    (ref geometry.rs FrameExpr::from_n_t). Returns (t, b, n)."""
    from ..core.math import orthonormal_basis

    t = tt - n * jnp.sum(n * tt, -1, keepdims=True)
    tlen = jnp.sqrt(jnp.sum(t * t, -1, keepdims=True))
    good = tlen[..., 0] > 1e-4
    t = jnp.where(good[..., None], t / jnp.maximum(tlen, 1e-20), 0.0)
    b = jnp.cross(n, t)
    blen = jnp.sqrt(jnp.sum(b * b, -1, keepdims=True))
    good = good & (blen[..., 0] > 1e-4)
    b = b / jnp.maximum(blen, 1e-20)
    ft, fb = orthonormal_basis(n)
    return (
        jnp.where(good[..., None], t, ft),
        jnp.where(good[..., None], b, fb),
        n,
    )


def normal_map(surface: Surface, ns, ng, frame, space: str = "tangent"):
    """Tangent-space normal perturbation (surface/mod.rs:1379-1417).

    ns: [N, 3] tangent-space normal (NOT decoded - raw shader value; all-zero
    means "no perturbation" and yields the identity frame). frame is the
    parent's (t, b, n); ng is the world geometric normal. Returns a
    SurfaceClosure whose frame lives in the parent's local space, to be
    nested inside the outer world-space closure (dispatch, eval.rs:418-423).
    """
    assert space == "tangent", f"only tangent-space normal maps supported, got {space}"
    t0, b0, n0 = frame
    is_zero = jnp.all(ns == 0.0, axis=-1)
    nrm = normalize(jnp.where(is_zero[..., None], jnp.array([0.0, 0.0, 1.0]), ns))
    n_world = Frame.to_world(t0, b0, n0, nrm)
    nt, nb, nn = frame_from_n_t(n_world, t0)
    # express the new frame in parent-local coordinates
    def tl(v):
        return Frame.to_local(t0, b0, n0, v)

    ident = (
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), nt.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), nb.shape),
        jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), nn.shape),
    )
    lt = jnp.where(is_zero[..., None], ident[0], tl(nt))
    lb = jnp.where(is_zero[..., None], ident[1], tl(nb))
    ln = jnp.where(is_zero[..., None], ident[2], tl(nn))
    return SurfaceClosure(surface, (lt, lb, ln), tl(ng))
