"""Per-stage wall-clock decomposition of ONE intersect_pairs call (round 5).

VERDICT r4 weak #2: 99.5% of the chip is idle on the flagship bottleneck —
this tool attributes the pair-sweep's wall-clock to its stages so the
optimization target is measured, not guessed:

  sort      ray key + argsort + permutation of the SoA
  cull      _cull_einit (fused Pallas conservative cull) [B, K]
  worder    walk-order argsort of e_init + kcnt
  round.gather   window gather + wb build ([B, 6, W])
  round.refine   _refine Pallas kernel
  round.select   cumsum/argsort selection glue
  round.sweep    _sweep_ent Pallas kernel (the MT work)

Each piece is jitted and timed separately on representative round state
(round 0: cursor 0, best = tlim). Per-round pieces multiply by the measured
round count (reported by a counting variant of the production while_loop).

Usage: python3 tools/profile_pairs_stages.py [--lanes N] [--scene path]
       [--rays diffuse|coherent]
"""
from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, *args, reps=4):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=262144)
    ap.add_argument("--scene", default="/root/repo/scenes/classroom/scene.json")
    ap.add_argument("--rays", default="diffuse", choices=["diffuse", "coherent"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from akari_render_tpu.accel import pairs as P
    from akari_render_tpu.camera import generate_rays
    from akari_render_tpu.core.math import RAY_TMAX, normalize
    from akari_render_tpu.scene import load_scene

    out = {"rays": args.rays, "block": P.BLOCK, "maxc": P.MAXC,
           "wmult": P.WINDOW_MULT, "key": P._sort_key_mode()}
    scene = load_scene(args.scene)
    a = scene.arrays
    cl = a.unified if a.unified is not None else a.bvh["clusters"]
    K = int(cl.cbmin.shape[0])
    out["K"] = K

    n = args.lanes
    w = scene.camera.width
    pix = jnp.arange(n, dtype=jnp.uint32)
    p_film = jnp.stack(
        [(pix % w).astype(jnp.float32), (pix // w).astype(jnp.float32)], -1
    ) + 0.5
    ray_o, ray_d = generate_rays(scene.camera, p_film)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e30)
    if args.rays == "diffuse":
        hit = jax.jit(lambda o, d: scene.intersect(o, d, tmin, tmax))(
            ray_o, ray_d
        )
        si = scene.surface_interaction(jnp.maximum(hit.tri_id, 0), hit.bary)
        ns = si["ns"]
        u = jr.uniform(jr.PRNGKey(7), (n, 2))
        r = jnp.sqrt(u[:, 0])
        phi = 2 * jnp.pi * u[:, 1]
        lz = jnp.sqrt(jnp.maximum(0.0, 1 - u[:, 0]))
        up = jnp.where(jnp.abs(ns[:, 2:3]) < 0.999,
                       jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
        t1 = normalize(jnp.cross(up, ns))
        t2 = jnp.cross(ns, t1)
        ray_d = normalize(t1 * (r * jnp.cos(phi))[:, None]
                          + t2 * (r * jnp.sin(phi))[:, None] + ns * lz[:, None])
        ray_o = si["p"] + ns * 1e-3
        tmax = jnp.where(hit.valid, 1e30, -1.0)

    BLOCK = P.BLOCK
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    B = n_pad // BLOCK
    out["B"] = B

    # ---- stage: sort + block summaries -------------------------------------
    @jax.jit
    def stage_sort(o, d, tmn, tmx):
        finite = jnp.isfinite(o).all(-1) & jnp.isfinite(d).all(-1)
        o = jnp.where(finite[:, None], o, 0.0)
        d = jnp.where(finite[:, None], d, 1.0)
        tmx = jnp.where(finite, tmx, -1.0)
        scene_lo = cl.cbmin.min(axis=0)
        scene_hi = cl.cbmax.max(axis=0)
        keys = P._morton_keys(o, d, scene_lo[None, :], scene_hi[None, :])
        keys = jnp.where(tmx <= tmn, jnp.uint32(0xFFFFFFFF), keys)
        perm = jnp.argsort(keys)
        pad = n_pad - n

        def srt(x, fill):
            return jnp.pad(x[perm], ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                           constant_values=fill)

        os_ = srt(o, 0.0)
        ds_ = srt(d, 1.0)
        tmins = srt(tmn, 0.0)
        tlims = srt(jnp.minimum(tmx, RAY_TMAX), -1.0)
        ob = os_.reshape(B, BLOCK, 3)
        olo, ohi = ob.min(axis=1), ob.max(axis=1)
        inv_d = 1.0 / jnp.where(jnp.abs(ds_) < 1e-20,
                                jnp.where(ds_ < 0, -1e-20, 1e-20), ds_)
        ib = inv_d.reshape(B, BLOCK, 3)
        ilo, ihi = ib.min(axis=1), ib.max(axis=1)
        bt0 = tmins.reshape(B, BLOCK).min(axis=1)
        summ = jnp.concatenate(
            [olo, ohi, ilo, ihi, bt0[:, None], jnp.zeros((B, 3))], axis=1)
        return os_, ds_, inv_d, tmins, tlims, summ

    dt, (os_, ds_, inv_d, tmins, tlims, summ) = timed(
        stage_sort, ray_o, ray_d, tmin, tmax)
    out["sort_ms"] = round(dt * 1e3, 2)

    # ---- stage: cull --------------------------------------------------------
    cb6 = jnp.concatenate([cl.cbmin.T, cl.cbmax.T], axis=0)
    dt, e_init = timed(lambda s: P._cull_einit(s, cb6, False), summ)
    out["cull_ms"] = round(dt * 1e3, 2)

    # ---- stage: walk order --------------------------------------------------
    @jax.jit
    def stage_worder(e):
        worder = jnp.argsort(e, axis=1).astype(jnp.int32)
        went = jnp.take_along_axis(e, worder, axis=1)
        kcnt = jnp.sum(jnp.isfinite(e), axis=1).astype(jnp.int32)
        return worder, went, kcnt

    dt, (worder, went, kcnt) = timed(stage_worder, e_init)
    out["worder_ms"] = round(dt * 1e3, 2)

    # ---- per-round stages at round-0 state ----------------------------------
    INF = jnp.inf
    maxc_eff = min(P.MAXC, K)
    W = min(maxc_eff * P.WINDOW_MULT, K)
    wch = min(P._REFINE_WCH, W)
    W_pad = ((W + wch - 1) // wch) * wch
    posW = jnp.arange(W, dtype=jnp.int32)
    o_soa, d_soa, inv_soa = os_.T, ds_.T, inv_d.T
    lim = jnp.stack([tmins, tlims])
    ex = jnp.stack([jnp.full((n_pad,), -1.0)] * 3 + [jnp.zeros((n_pad,))])
    best0 = jnp.stack([tlims, jnp.full((n_pad,), -1.0),
                       jnp.zeros((n_pad,)), jnp.zeros((n_pad,))])
    cursor0 = jnp.zeros((B,), jnp.int32)

    @jax.jit
    def stage_gather(cursor, went, worder, kcnt):
        idx = cursor[:, None] + posW[None, :]
        idx_c = jnp.minimum(idx, K - 1)
        win_e = jnp.take_along_axis(went, idx_c, axis=1)
        win_i = jnp.take_along_axis(worder, idx_c, axis=1)
        win_e = jnp.where(idx < kcnt[:, None], win_e, INF)
        wb = jnp.concatenate(
            [cl.cbmin[win_i], cl.cbmax[win_i]], axis=-1).transpose(0, 2, 1)
        if W_pad != W:
            fill = jnp.broadcast_to(
                jnp.array([INF] * 3 + [-INF] * 3, jnp.float32)[None, :, None],
                (B, 6, W_pad - W))
            wb = jnp.concatenate([wb, fill], axis=2)
        return win_e, win_i, wb

    dt, (win_e, win_i, wb) = timed(stage_gather, cursor0, went, worder, kcnt)
    out["round_gather_ms"] = round(dt * 1e3, 2)

    lane_lim = jnp.stack([tmins, best0[0]])
    dt, passed = timed(lambda: P._refine(wb, o_soa, inv_soa, lane_lim, False))
    out["round_refine_ms"] = round(dt * 1e3, 2)

    @jax.jit
    def stage_select(passed, win_e, win_i):
        nonzero = (passed[:, :W] > 0) & jnp.isfinite(win_e)
        kept_rank = jnp.cumsum(nonzero.astype(jnp.int32), axis=1)
        selected = nonzero & (kept_rank <= maxc_eff)
        key = jnp.where(selected, posW[None, :], W + posW[None, :])
        order = jnp.argsort(key, axis=1)[:, :maxc_eff]
        cand_ok = jnp.take_along_axis(selected, order, axis=1)
        cand_i = jnp.take_along_axis(win_i, order, axis=1)
        tri_row = (cl.tri_row if cl.tri_row is not None
                   else jnp.arange(K, dtype=jnp.int32))
        dummy_row = cl.tri.shape[0]  # one past: matches padded table below
        tri_ix = jnp.where(cand_ok, tri_row[cand_i], dummy_row).astype(jnp.int32)
        xf_ix = (jnp.where(cand_ok, cand_i, K).astype(jnp.int32)
                 if cl.xf is not None else jnp.zeros_like(tri_ix))
        cand_e = jnp.where(
            cand_ok, jnp.take_along_axis(win_e, order, axis=1), jnp.inf
        )[:, None, :].astype(jnp.float32)
        frac = jnp.mean(nonzero.astype(jnp.float32))
        return tri_ix, xf_ix, cand_e, frac

    dt, (tri_ix, xf_ix, cand_e, frac) = timed(stage_select, passed, win_e, win_i)
    out["round_select_ms"] = round(dt * 1e3, 2)
    out["refine_pass_frac_round0"] = round(float(frac), 4)

    c_size = cl.tri.shape[1]
    dummy = jnp.zeros((1, c_size, 12), jnp.float32).at[0, :, 9].set(-1.0)
    tri = jnp.concatenate([cl.tri, dummy], axis=0)
    ident = (jnp.zeros((1, 16), jnp.float32).at[0, 0].set(1.0)
             .at[0, 5].set(1.0).at[0, 10].set(1.0))
    xf_tab = (jnp.concatenate([cl.xf, ident], axis=0)
              if cl.xf is not None else ident)[:, None, :]

    dt, _ = timed(lambda: P._sweep_ent(
        tri_ix, xf_ix, o_soa, d_soa, lim, ex, cand_e, tri, xf_tab, best0,
        False, False))
    out["round_sweep_ms"] = round(dt * 1e3, 2)

    # ---- measured round count: run the production carry loop HOST-side ----
    # (same condition/body as intersect_pairs but stepping one round per
    # device call so we can count; the count is exact, the wall time is not)
    import numpy as np

    from akari_render_tpu.accel.pairs import intersect_pairs

    rounds = count_rounds(P, cl, os_, ds_, inv_d, tmins, tlims, summ, e_init,
                          worder, went, kcnt, B, K, n_pad)
    out["rounds"] = rounds
    per_round = (out["round_gather_ms"] + out["round_refine_ms"]
                 + out["round_select_ms"] + out["round_sweep_ms"])
    out["model_total_ms"] = round(
        out["sort_ms"] + out["cull_ms"] + out["worder_ms"]
        + per_round * rounds, 1)

    @jax.jit
    def full(o, d, tmx):
        return intersect_pairs(cl, o, d, tmin, tmx).t

    dt, _ = timed(full, ray_o, ray_d, tmax)
    out["actual_total_ms"] = round(dt * 1e3, 1)
    print(json.dumps(out))


def count_rounds(P, cl, os_, ds_, inv_d, tmins, tlims, summ, e_init, worder,
                 went, kcnt, B, K, n_pad):
    """Exact production round count: replays round_body's cursor/live logic
    with the real sweep, one round per device step."""
    import jax
    import jax.numpy as jnp

    INF = jnp.inf
    maxc_eff = min(P.MAXC, K)
    W = min(maxc_eff * P.WINDOW_MULT, K)
    wch = min(P._REFINE_WCH, W)
    W_pad = ((W + wch - 1) // wch) * wch
    posW = jnp.arange(W, dtype=jnp.int32)
    o_soa, d_soa = os_.T, ds_.T
    inv_soa = inv_d.T
    lim = jnp.stack([tmins, tlims])
    ex = jnp.stack([jnp.full((n_pad,), -1.0)] * 3 + [jnp.zeros((n_pad,))])
    best = jnp.stack([tlims, jnp.full((n_pad,), -1.0),
                      jnp.zeros((n_pad,)), jnp.zeros((n_pad,))])
    c_size = cl.tri.shape[1]
    dummy = jnp.zeros((1, c_size, 12), jnp.float32).at[0, :, 9].set(-1.0)
    tri = jnp.concatenate([cl.tri, dummy], axis=0)
    dummy_row = tri.shape[0] - 1
    tri_row = (cl.tri_row if cl.tri_row is not None
               else jnp.arange(K, dtype=jnp.int32))
    ident = (jnp.zeros((1, 16), jnp.float32).at[0, 0].set(1.0)
             .at[0, 5].set(1.0).at[0, 10].set(1.0))
    xf_tab = (jnp.concatenate([cl.xf, ident], axis=0)
              if cl.xf is not None else ident)[:, None, :]

    def block_lim(b):
        return b[0].reshape(B, P.BLOCK).max(axis=1)

    @jax.jit
    def one_round(cursor, live, best):
        bt1 = block_lim(best)
        idx = cursor[:, None] + posW[None, :]
        idx_c = jnp.minimum(idx, K - 1)
        win_e = jnp.take_along_axis(went, idx_c, axis=1)
        win_i = jnp.take_along_axis(worder, idx_c, axis=1)
        win_e = jnp.where((idx < kcnt[:, None]) & live[:, None], win_e, INF)
        wb = jnp.concatenate(
            [cl.cbmin[win_i], cl.cbmax[win_i]], axis=-1).transpose(0, 2, 1)
        if W_pad != W:
            fill = jnp.broadcast_to(
                jnp.array([INF] * 3 + [-INF] * 3, jnp.float32)[None, :, None],
                (B, 6, W_pad - W))
            wb = jnp.concatenate([wb, fill], axis=2)
        passed = P._refine(wb, o_soa, inv_soa, jnp.stack([tmins, best[0]]),
                           False)
        nonzero = (passed[:, :W] > 0) & jnp.isfinite(win_e)
        kept_rank = jnp.cumsum(nonzero.astype(jnp.int32), axis=1)
        selected = nonzero & (kept_rank <= maxc_eff)
        kept_count = kept_rank[:, -1]
        full_consume = kept_count <= maxc_eff
        cut = jnp.max(jnp.where(selected, posW[None, :], -1), axis=1)
        advance = jnp.where(full_consume, W, cut + 1)
        key = jnp.where(selected, posW[None, :], W + posW[None, :])
        order = jnp.argsort(key, axis=1)[:, :maxc_eff]
        cand_ok = jnp.take_along_axis(selected, order, axis=1)
        cand_i = jnp.take_along_axis(win_i, order, axis=1)
        tri_ix = jnp.where(cand_ok, tri_row[cand_i], dummy_row).astype(jnp.int32)
        xf_ix = (jnp.where(cand_ok, cand_i, K).astype(jnp.int32)
                 if cl.xf is not None else jnp.zeros_like(tri_ix))
        cand_e = jnp.where(
            cand_ok, jnp.take_along_axis(win_e, order, axis=1), jnp.inf
        )[:, None, :].astype(jnp.float32)
        outb = P._sweep_ent(tri_ix, xf_ix, o_soa, d_soa, lim, ex, cand_e,
                            tri, xf_tab, best, False, False)
        cursor_new = jnp.where(live, cursor + advance, cursor)
        c = jnp.minimum(cursor_new, K - 1)
        e_at = jnp.take_along_axis(went, c[:, None], axis=1)[:, 0]
        new_live = live & (cursor_new < kcnt) & (e_at <= block_lim(outb))
        return cursor_new, new_live, outb, jnp.sum(selected), jnp.sum(live)

    cursor = jnp.zeros((B,), jnp.int32)
    c0 = jnp.minimum(cursor, K - 1)
    e_at = jnp.take_along_axis(went, c0[:, None], axis=1)[:, 0]
    live = (cursor < kcnt) & (e_at <= block_lim(best))
    rounds = 0
    swept_total = 0
    live_series = []
    while bool(jnp.any(live)) and rounds < 500:
        cursor, live, best, swept, nlive = one_round(cursor, live, best)
        rounds += 1
        swept_total += int(swept)
        live_series.append(int(nlive))
    print(f"# rounds={rounds} swept_total={swept_total} "
          f"live_series={live_series[:40]}", file=__import__('sys').stderr)
    return rounds


def main_static():
    """Stage decomposition of the STATIC walk (AKR_PAIRS_STATIC=1 path)."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=262144)
    ap.add_argument("--scene", default="/root/repo/scenes/classroom/scene.json")
    ap.add_argument("--rays", default="diffuse")
    ap.add_argument("static", nargs="?")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from akari_render_tpu.accel import pairs as P
    from akari_render_tpu.camera import generate_rays
    from akari_render_tpu.core.math import RAY_TMAX, normalize
    from akari_render_tpu.scene import load_scene

    out = {"rays": args.rays, "block": P.BLOCK, "maxc": P.MAXC,
           "key": P._sort_key_mode(), "mode": "static",
           "g": P._sweep_group()}
    scene = load_scene(args.scene)
    a = scene.arrays
    cl = a.unified if a.unified is not None else a.bvh["clusters"]
    K = int(cl.cbmin.shape[0])
    out["K"] = K
    n = args.lanes
    w = scene.camera.width
    pix = jnp.arange(n, dtype=jnp.uint32)
    p_film = jnp.stack(
        [(pix % w).astype(jnp.float32), (pix // w).astype(jnp.float32)], -1
    ) + 0.5
    ray_o, ray_d = generate_rays(scene.camera, p_film)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e30)
    if args.rays == "diffuse":
        hit = jax.jit(lambda o, d: scene.intersect(o, d, tmin, tmax))(
            ray_o, ray_d)
        si = scene.surface_interaction(jnp.maximum(hit.tri_id, 0), hit.bary)
        ns = si["ns"]
        u = jr.uniform(jr.PRNGKey(7), (n, 2))
        r = jnp.sqrt(u[:, 0])
        phi = 2 * jnp.pi * u[:, 1]
        lz = jnp.sqrt(jnp.maximum(0.0, 1 - u[:, 0]))
        up = jnp.where(jnp.abs(ns[:, 2:3]) < 0.999,
                       jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
        t1 = normalize(jnp.cross(up, ns))
        t2 = jnp.cross(ns, t1)
        ray_d = normalize(t1 * (r * jnp.cos(phi))[:, None]
                          + t2 * (r * jnp.sin(phi))[:, None] + ns * lz[:, None])
        ray_o = si["p"] + ns * 1e-3
        tmax = jnp.where(hit.valid, 1e30, -1.0)

    BLOCK = P.BLOCK
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    B = n_pad // BLOCK
    out["B"] = B

    @jax.jit
    def prep(o, d, tmn, tmx):
        finite = jnp.isfinite(o).all(-1) & jnp.isfinite(d).all(-1)
        o = jnp.where(finite[:, None], o, 0.0)
        d = jnp.where(finite[:, None], d, 1.0)
        tmx = jnp.where(finite, tmx, -1.0)
        scene_lo = cl.cbmin.min(axis=0)
        scene_hi = cl.cbmax.max(axis=0)
        keys = P._morton_keys(o, d, scene_lo[None, :], scene_hi[None, :])
        keys = jnp.where(tmx <= tmn, jnp.uint32(0xFFFFFFFF), keys)
        perm = jnp.argsort(keys)
        pad = n_pad - n

        def srt(x, fill):
            return jnp.pad(x[perm], ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                           constant_values=fill)

        os_ = srt(o, 0.0)
        ds_ = srt(d, 1.0)
        tmins = srt(tmn, 0.0)
        tlims = srt(jnp.minimum(tmx, RAY_TMAX), -1.0)
        ob = os_.reshape(B, BLOCK, 3)
        olo, ohi = ob.min(axis=1), ob.max(axis=1)
        inv_d = 1.0 / jnp.where(jnp.abs(ds_) < 1e-20,
                                jnp.where(ds_ < 0, -1e-20, 1e-20), ds_)
        ib = inv_d.reshape(B, BLOCK, 3)
        ilo, ihi = ib.min(axis=1), ib.max(axis=1)
        bt0 = tmins.reshape(B, BLOCK).min(axis=1)
        summ = jnp.concatenate(
            [olo, ohi, ilo, ihi, bt0[:, None], jnp.zeros((B, 3))], axis=1)
        return os_, ds_, inv_d, tmins, tlims, summ

    dt, (os_, ds_, inv_d, tmins, tlims, summ) = timed(
        prep, ray_o, ray_d, tmin, tmax)
    out["sort_ms"] = round(dt * 1e3, 2)
    cb6 = jnp.concatenate([cl.cbmin.T, cl.cbmax.T], axis=0)
    dt, e_con = timed(lambda s: P._cull_einit(s, cb6, False), summ)
    out["cull_ms"] = round(dt * 1e3, 2)
    o_soa, d_soa, inv_soa = os_.T, ds_.T, inv_d.T
    lim = jnp.stack([tmins, tlims])
    dt, e_init = timed(
        lambda: P._refine_all(cb6, o_soa, inv_soa, lim, e_con, False))
    out["refine_all_ms"] = round(dt * 1e3, 2)

    @jax.jit
    def worder_fn(e):
        worder = jnp.argsort(e, axis=1).astype(jnp.int32)
        went = jnp.take_along_axis(e, worder, axis=1)
        kcnt = jnp.sum(jnp.isfinite(e), axis=1).astype(jnp.int32)
        return worder, went, kcnt

    dt, (worder, went, kcnt) = timed(worder_fn, e_init)
    out["worder_ms"] = round(dt * 1e3, 2)
    out["kcnt_mean"] = round(float(jnp.mean(kcnt)), 1)
    out["kcnt_max"] = int(jnp.max(kcnt))

    # one full static round at round-0 state
    maxc_eff = min(P.MAXC, K)
    ex = jnp.stack([jnp.full((n_pad,), -1.0)] * 3 + [jnp.zeros((n_pad,))])
    best0 = jnp.stack([tlims, jnp.full((n_pad,), -1.0),
                       jnp.zeros((n_pad,)), jnp.zeros((n_pad,))])
    posC = jnp.arange(maxc_eff, dtype=jnp.int32)
    c_size = cl.tri.shape[1]
    dummy = jnp.zeros((1, c_size, 12), jnp.float32).at[0, :, 9].set(-1.0)
    tri = jnp.concatenate([cl.tri, dummy], axis=0)
    dummy_row = tri.shape[0] - 1
    tri_row = (cl.tri_row if cl.tri_row is not None
               else jnp.arange(K, dtype=jnp.int32))
    ident = (jnp.zeros((1, 16), jnp.float32).at[0, 0].set(1.0)
             .at[0, 5].set(1.0).at[0, 10].set(1.0))
    xf_tab = (jnp.concatenate([cl.xf, ident], axis=0)
              if cl.xf is not None else ident)[:, None, :]

    @jax.jit
    def round_glue(cursor, live):
        idx = cursor[:, None] + posC[None, :]
        idx_c = jnp.minimum(idx, K - 1)
        cand_i = jnp.take_along_axis(worder, idx_c, axis=1)
        cand_er = jnp.take_along_axis(went, idx_c, axis=1)
        ok = (idx < kcnt[:, None]) & live[:, None] & jnp.isfinite(cand_er)
        tri_ix = jnp.where(ok, tri_row[cand_i], dummy_row).astype(jnp.int32)
        xf_ix = (jnp.where(ok, cand_i, K).astype(jnp.int32)
                 if cl.xf is not None else jnp.zeros_like(tri_ix))
        cand_e = jnp.where(ok, cand_er, jnp.inf)[:, None, :].astype(jnp.float32)
        return tri_ix, xf_ix, cand_e

    cursor0 = jnp.zeros((B,), jnp.int32)
    live0 = jnp.ones((B,), bool)
    dt, (tri_ix, xf_ix, cand_e) = timed(round_glue, cursor0, live0)
    out["round_glue_ms"] = round(dt * 1e3, 2)
    dt, _ = timed(lambda: P._sweep_ent(
        tri_ix, xf_ix, o_soa, d_soa, lim, ex, cand_e, tri, xf_tab, best0,
        False, False))
    out["round_sweep_ms"] = round(dt * 1e3, 2)

    # count rounds by running the production intersect... via cursor sim
    import numpy as np

    went_np = np.asarray(went)
    kcnt_np = np.asarray(kcnt)
    hit = scene.intersect(ray_o, ray_d, tmin, tmax)
    t_true = jnp.where(hit.valid, hit.t, jnp.minimum(tmax, RAY_TMAX))
    # resort t by the same perm prep used
    finite = jnp.isfinite(ray_o).all(-1) & jnp.isfinite(ray_d).all(-1)
    tmx2 = jnp.where(finite, tmax, -1.0)
    scene_lo = cl.cbmin.min(axis=0)
    scene_hi = cl.cbmax.max(axis=0)
    keys = P._morton_keys(jnp.where(finite[:, None], ray_o, 0.0),
                          jnp.where(finite[:, None], ray_d, 1.0),
                          scene_lo[None, :], scene_hi[None, :])
    keys = jnp.where(tmx2 <= tmin, jnp.uint32(0xFFFFFFFF), keys)
    perm = jnp.argsort(keys)
    ts = jnp.pad(t_true[perm], (0, n_pad - n), constant_values=-1.0)
    bt1f = np.asarray(ts.reshape(B, BLOCK).max(axis=1))
    consumed = np.zeros(B, np.int64)
    for b in range(B):
        consumed[b] = np.searchsorted(went_np[b, : kcnt_np[b]], bt1f[b],
                                      "right")
    rounds = int(np.ceil(consumed / max(maxc_eff, 1)).max())
    out["rounds_lockstep_bound"] = rounds
    out["consumed_total"] = int(consumed.sum())
    out["model_total_ms"] = round(
        out["sort_ms"] + out["cull_ms"] + out["refine_all_ms"]
        + out["worder_ms"]
        + (out["round_glue_ms"] + out["round_sweep_ms"]) * rounds, 1)

    from akari_render_tpu.accel.pairs import intersect_pairs

    @jax.jit
    def full(o, d, tmx):
        return intersect_pairs(cl, o, d, tmin, tmx).t

    dt, _ = timed(full, ray_o, ray_d, tmax)
    out["actual_total_ms"] = round(dt * 1e3, 1)
    import json as _json

    print(_json.dumps(out))


if __name__ == "__main__":
    import sys as _sys

    if "static" in _sys.argv:
        main_static()
    else:
        main()
