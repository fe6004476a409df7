"""Multi-config benchmark sweep over the BASELINE.json headline configs.

Prints one JSON line per config (bench.py remains the single-line
headline entry the driver consumes). Each number is the steady-state
device pipeline rate for one frame (chained-loop timing; host/file I/O
excluded, matching the reference's 'frame rendering time' semantics).

Configs (BASELINE.md):
  1. 4K 2:1 lat/lon -> 1920x1080 rectilinear, hfov 90, bilinear
  2. 8K equirect -> 6x2048 cubemap, degree 3 (bench.py's headline)
     and the reverse direction
  3. biatan6 cubemap -> stereographic with yaw/pitch sweep, fov>90 faces
  4. twining anti-aliased downscale: 8K equirect -> 2K rectilinear
     (auto twine) - 16K sources exceed this chip's HBM with the
     pole-patch copies, so the config runs at 8K
  5. PTO-style 3-facet voronoi stitch (multi-facet fused path)
"""

import json
import math
import sys
import time

import numpy as np


def _timeit_frame(frame_fn, args, n_px, runs=6):
    import jax
    import jax.numpy as jnp

    out = jax.block_until_ready(frame_fn(*args, jnp.float32(0)))

    @jax.jit
    def loop(*a):
        def body(i, carry):
            img = frame_fn(*a, carry * 1e-30)
            return carry + img.ravel()[0]
        return jax.lax.fori_loop(0, runs, body, jnp.float32(0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / runs
    return n_px / 1e6 / dt


def _report(name, mpix_s, extra=""):
    print(json.dumps({"config": name, "value": round(mpix_s, 1),
                      "unit": "Mpix/s", "note": extra}))


def main():
    import jax
    import jax.numpy as jnp

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.models import cubemap as CBM
    from envutil_tpu.ops import pallas_resample as PR
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime import fastpath as FP
    from envutil_tpu.runtime.loader import _attach_variants
    from envutil_tpu.runtime.render import build_plan

    def make_env_source(w, h, degree, variants=True):
        yy, xx = np.meshgrid(np.linspace(0, 1, h, dtype=np.float32),
                             np.linspace(0, 1, w, dtype=np.float32),
                             indexing="ij")
        img = np.stack([xx, yy, xx * yy], axis=-1)
        fct = Facet(facet_no=0, nchannels=3)
        fct.set_geometry(Projection.SPHERICAL, w, h, 2 * math.pi)
        fct.step = get_step(Projection.SPHERICAL, w, h, 2 * math.pi)
        fct.process_geometry()
        src = jax.device_put(E.make_mount_source(fct, img, degree,
                                                 degree))
        if variants:
            class _A:
                verbose = False
                precise = False
            _A.spline_degree = degree
            _A.prefilter_degree = degree
            _attach_variants(src, fct, _A())
        jax.block_until_ready(src.spl.coeff)
        return fct, src

    def make_plan(fct, projection, w, h, hfov_deg, degree, yaw=0.0,
                  pitch=0.0, twine=0, facets=None, solo=0):
        args = Args()
        args.projection = projection
        args.width, args.height = w, h
        args.hfov = math.radians(hfov_deg)
        args.extent = get_extent(projection, w, h, args.hfov)
        args.step = (args.extent.x1 - args.extent.x0) / w
        args.yaw = math.radians(yaw)
        args.pitch = math.radians(pitch)
        args.spline_degree = degree
        args.prefilter_degree = degree
        args.twine = twine
        args.synopsis = "panorama"
        args.nchannels = 3
        args.facets = facets or [fct]
        args.solo = solo
        if twine:
            args.twine_setup()
        return args, build_plan(args, args.facets)

    def fused_passes(plan, src, degree, window, twined_spread=None):
        """Static per-plan pass list like the fast path builds."""
        basis = FP._basis_arg(plan, 0)
        names = FP._variant_names(src)
        nty = (window[1] - window[0]) // PR.TILE_H
        ntx = (window[3] - window[2]) // PR.TILE_W
        assigned = np.full((nty, ntx), -1, np.int32)
        passes = []
        data = {}
        for name in names:
            spl = FP._variant_spline(src, name)
            if twined_spread is None:
                sx, sy, m, _z = FP._coords(plan, window, name, src, 0,
                                           (0.0, 0.0), basis)
                data[name] = (sx, sy, m)
                stats = [np.asarray(s) for s in PR.tile_stats(sx, sy)]
            else:
                c0 = FP._coords(plan, window, name, src, 0,
                                (0.0, 0.0), basis)
                c10 = FP._coords(plan, window, name, src, 0,
                                 (0.25, 0.0), basis)
                c01 = FP._coords(plan, window, name, src, 0,
                                 (0.0, 0.25), basis)
                sx, sy, m = c0[0], c0[1], c0[2]
                dux, dvx = FP._deriv(sx, c10[0], c01[0])
                duy, dvy = FP._deriv(sy, c10[1], c01[1])
                data[name] = (sx, sy, m, dux, duy, dvx, dvy)
                cmx = max(abs(c[0]) for c in twined_spread)
                cmy = max(abs(c[1]) for c in twined_spread)
                mx = cmx * jnp.abs(dux) + cmy * jnp.abs(dvx)
                my = cmx * jnp.abs(duy) + cmy * jnp.abs(dvy)
                stats = [np.asarray(s) for s in PR.tile_stats_range(
                    sx - mx, sx + mx, sy - my, sy + my)]
            for wc in (PR.LOCAL, PR.DIAG):
                origins, fast = PR.classify_tiles(
                    stats, spl.coeff.shape[0], spl.coeff.shape[1],
                    degree, wc)
                take = fast & (assigned == -1)
                if take.any():
                    assigned[take] = len(passes)
                    org3 = np.concatenate(
                        [origins, take.reshape(-1, 1).astype(np.int32)],
                        axis=1)
                    passes.append((name, wc, jnp.asarray(org3)))
                if (assigned != -1).all():
                    break
            if (assigned != -1).all():
                break
        frac = (assigned >= 0).mean()
        return passes, assigned, data, frac

    def fused_frame_fn(plan, src, degree, window, passes, assigned):
        state = {
            "src": src,
            "basis": FP._basis_arg(plan, 0),
            "sel": jnp.asarray(np.repeat(
                np.repeat(assigned, PR.TILE_H, 0), PR.TILE_W, 1)),
            "coeffs": {n: jnp.moveaxis(
                FP._variant_spline(src, n).coeff, -1, 0)
                for n, _, _ in passes},
            "orgs": [org3 for _, _, org3 in passes],
        }

        def frame(st, eps):
            combined = None
            for pi, (name, wc, _o) in enumerate(passes):
                sx, sy, m, _z = FP._coords(plan, window, name,
                                           st["src"], 0, (0.0, 0.0),
                                           st["basis"])
                out = PR.resample_planar(st["coeffs"][name] + eps, sx,
                                         sy, st["orgs"][pi],
                                         degree=degree, wc=wc)
                img = FP._finish(out, m, 3, 1.0)
                combined = img if combined is None else \
                    jnp.where((st["sel"] == pi)[..., None], img,
                              combined)
            return combined
        return frame, state

    # ---- config 1: 4K latlon -> HD rectilinear, bilinear ------------
    fct, src = make_env_source(4096, 2048, 1)
    _, plan = make_plan(fct, Projection.RECTILINEAR, 1920, 1152, 90, 1,
                        yaw=30)
    window = (0, 1152, 0, 1920)
    passes, assigned, _, frac = fused_passes(plan, src, 1, window)
    frame, state = fused_frame_fn(plan, src, 1, window, passes,
                                  assigned)
    mpix = _timeit_frame(frame, (state,), 1920 * 1152)
    _report("4K latlon -> 1920x1152 rectilinear bilinear", mpix,
            f"{frac:.0%} fused")

    # ---- config 3: biatan6 cubemap -> stereographic sweep -----------
    faces = np.stack([np.random.rand(1024, 1024, 3).astype(np.float32)
                      for _ in range(6)])
    cfct = Facet(facet_no=0, nchannels=3)
    cfct.set_geometry(Projection.BIATAN6, 1024, 6144,
                      math.radians(100))
    cfct.step = get_step(Projection.BIATAN6, 1024, 6144,
                         math.radians(100))
    cfct.process_geometry()
    csrc = CBM.make_cubemap_source(cfct, faces, 3, 3, 8, 64)
    jax.block_until_ready(csrc.spl.coeff)
    _, plan3 = make_plan(cfct, Projection.STEREOGRAPHIC, 1920, 1152,
                         150, 3, yaw=35, pitch=20)
    window3 = (0, 1152, 0, 1920)
    passes, assigned, _, frac = fused_passes(plan3, csrc, 3, window3)
    frame, state = fused_frame_fn(plan3, csrc, 3, window3, passes,
                                  assigned)
    mpix = _timeit_frame(frame, (state,), 1920 * 1152)
    _report("biatan6(fov100) -> 1920x1152 stereographic deg-3 "
            "(yaw35/pitch20)", mpix, f"{frac:.0%} fused")

    # ---- config 4: twining downscale 8K -> 2K -----------------------
    fct8, src8 = make_env_source(8192, 4096, 1)
    args4, plan4 = make_plan(fct8, Projection.RECTILINEAR, 2048, 1280,
                             100, 1, twine=-1)
    spread = tuple((4.0 * cx, 4.0 * cy, w)
                   for cx, cy, w in args4.twine_spread)
    window4 = (0, 1280, 0, 2048)
    passes, assigned, data, frac = fused_passes(plan4, src8, 1, window4,
                                                twined_spread=spread)
    spread_flat = jnp.asarray(np.asarray(spread, np.float32).ravel())
    cmx = max(abs(c[0]) for c in spread)
    cmy = max(abs(c[1]) for c in spread)
    state4 = {
        "src": src8,
        "basis": FP._basis_arg(plan4, 0),
        "sel": jnp.asarray(np.repeat(np.repeat(assigned, PR.TILE_H, 0),
                                     PR.TILE_W, 1)),
        "coeffs": {n: jnp.moveaxis(
            FP._variant_spline(src8, n).coeff, -1, 0)
            for n, _, _ in passes},
        "orgs": [o for _, _, o in passes],
        "spread": jnp.asarray(np.asarray(spread, np.float32).ravel()),
    }

    def frame4(st, eps):
        combined = None
        for pi, (name, wc, _o) in enumerate(passes):
            c0 = FP._coords(plan4, window4, name, st["src"], 0,
                            (0.0, 0.0), st["basis"])
            c10 = FP._coords(plan4, window4, name, st["src"], 0,
                             (0.25, 0.0), st["basis"])
            c01 = FP._coords(plan4, window4, name, st["src"], 0,
                             (0.0, 0.25), st["basis"])
            sx, sy, m = c0[0], c0[1], c0[2]
            dux, dvx = FP._deriv(sx, c10[0], c01[0])
            duy, dvy = FP._deriv(sy, c10[1], c01[1])
            out = PR.resample_twined(
                st["coeffs"][name] + eps, sx, sy, dux, duy, dvx, dvy,
                st["orgs"][pi], st["spread"], degree=1,
                n_taps=len(spread), cmax_x=cmx, cmax_y=cmy, wc=wc)
            img = FP._finish(out, m, 3, 1.0)
            combined = img if combined is None else \
                jnp.where((st["sel"] == pi)[..., None], img, combined)
        return combined

    mpix = _timeit_frame(frame4, (state4,), 2048 * 1280)
    _report(f"8K equirect -> 2048x1280 rectilinear, fused twining "
            f"({len(spread)} taps)", mpix, f"{frac:.0%} fused")

    # ---- config 5: 3-facet voronoi stitch ----------------------------
    # three rectilinear facets looking at different yaws
    f_imgs = [np.random.rand(1536, 2048, 3).astype(np.float32)
              for _ in range(3)]
    facets, srcs = [], []
    for i, yaw in enumerate((-40.0, 0.0, 40.0)):
        f = Facet(facet_no=i, nchannels=3)
        f.set_geometry(Projection.RECTILINEAR, 2048, 1536,
                       math.radians(65))
        f.step = get_step(Projection.RECTILINEAR, 2048, 1536,
                          math.radians(65))
        f.yaw = math.radians(yaw)
        f.process_geometry()
        facets.append(f)
        srcs.append(jax.device_put(
            E.make_mount_source(f, f_imgs[i], 3, 3)))
    args5, plan5 = make_plan(facets[0], Projection.SPHERICAL, 2048,
                             1024, 360, 3, facets=facets, solo=-1)
    window5 = (0, 1024, 0, 2048)
    per_facet = []
    for fi, s in enumerate(srcs):
        basis = FP._basis_arg(plan5, fi)
        sx, sy, m, z = FP._coords(plan5, window5, "orig", s, fi,
                                  (0.0, 0.0), basis)
        stats = [np.asarray(a) for a in PR.tile_stats(sx, sy)]
        covered = np.asarray(m).reshape(8, PR.TILE_H, 16, PR.TILE_W) \
            .any(axis=(1, 3))
        origins, fast = PR.classify_tiles(
            stats, s.spl.coeff.shape[0], s.spl.coeff.shape[1], 3,
            PR.LOCAL)
        act = (fast & covered)
        org3 = np.concatenate(
            [origins, act.reshape(-1, 1).astype(np.int32)], axis=1)
        per_facet.append((fi, jnp.asarray(org3), basis,
                          float(covered.mean()),
                          float((fast | ~covered).mean())))

    from envutil_tpu.models import synopsis as SYN

    state5 = {
        "srcs": tuple(srcs),
        "orgs": [o for _fi, o, _b, _c, _f in per_facet],
        "bases": [b for _fi, _o, b, _c, _f in per_facet],
    }

    def frame5(st, eps):
        pxs, masks, scores = [], [], []
        for fi, _o, _b, _c, _f in per_facet:
            s = st["srcs"][fi]
            sx, sy, m, z = FP._coords(plan5, window5, "orig", s, fi,
                                      (0.0, 0.0), st["bases"][fi])
            cp = jnp.moveaxis(s.spl.coeff, -1, 0)
            out = PR.resample_planar(cp + eps, sx, sy, st["orgs"][fi],
                                     degree=3, wc=PR.LOCAL)
            img = FP._finish(out, m, 3, 1.0)
            pxs.append(img)
            masks.append(m)
            scores.append(jnp.where(m, z * s.static.recip_step,
                                    float(np.finfo(np.float32).min)))
        return SYN.voronoi_stack(jnp.stack(pxs), jnp.stack(masks),
                                 jnp.stack(scores))

    cov_ok = min(f for *_x, f in per_facet)
    mpix = _timeit_frame(frame5, (state5,), 2048 * 1024)
    _report("3-facet voronoi stitch -> 2048x1024 equirect deg-3", mpix,
            f">= {cov_ok:.0%} tiles fused per facet")


if __name__ == "__main__":
    main()
