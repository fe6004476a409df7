"""Multi-config benchmark sweep over the BASELINE.json headline configs.

Prints one JSON line per config (bench.py remains the single-line
headline entry the driver consumes). Each number is the steady-state
device pipeline rate for one frame (chained-loop timing; host/file I/O
excluded, matching the reference's 'frame rendering time' semantics).
All configs run the production fused path (fastpath.fused_frame).

Configs (BASELINE.md / BASELINE.json):
  1.  4K 2:1 lat/lon -> 1920x1152 rectilinear, hfov 90, bilinear
  2.  8K equirect -> 6x2048 cubemap, degree 3 (bench.py's headline)
  2r. the reverse: 6x2048 cubemap -> 8K equirect, degree 3
  3.  biatan6 cubemap -> stereographic and fisheye, fov>90 faces,
      yaw/pitch sweeps
  4.  twining anti-aliased downscale: 8K equirect -> 2K rectilinear
      (auto twine), plus the true 16K source with bfloat16
      coefficient storage (runs first for HBM headroom)
  5.  PTO-style stitches: 3-facet voronoi, 6-facet voronoi with PT
      lens correction, and a 3-bracket Eev HDR merge - all through
      the one-jit multi-facet frame

Latest sweep on one TPU v5e chip (2026-08-21 round 4, complete
frames, MATERIALIZED-FINISH contract - the timing loop carries the
finished interleaved image, so the planar->interleaved relayout is
paid every iteration like production serve/save; see NOTES.md
"Benchmark-semantics finding"): headline 8K equirect->cubemap 2980.7
(bench.py; driver-captured 2985.1), 16K/16-tap exact 593.2, 16K
--twine_pyramid 927.4, 4K bilinear 1597.5, 8K/4-tap twine 842.6,
biatan6->stereo 520.3. Configs not re-measured under the new
contract (old-contract values, finish sliced away by XLA): 3-facet
1371.8, 6-facet + lens 763.1, 6-facet 4-tap twined stitch 634.9
(champion-routed bands), cubemap->equirect 831.3, biatan6->fisheye
566.1, HDR merge 967.8.
Old-contract history for like-for-like comparison: round-4 headline
3362.7, round-3 3060, round-2 2181.5 (16K/16-tap 184.8, 4K 972,
3-facet 881.8), round-1 1532.
"""

import json
import math
import sys
import time

import numpy as np


def _timeit_frame(frame_fn, args, n_px, runs=24):
    import jax
    import jax.numpy as jnp

    img0 = jax.block_until_ready(frame_fn(*args, jnp.float32(0)))

    @jax.jit
    def loop(a, im0):
        def body(i, img):
            # the vanishing carry-dependent coordinate offset chains
            # the iterations, and carrying the IMAGE itself forces the
            # finished interleaved frame to materialize every
            # iteration - a scalar carry (acc + img.ravel()[0]) lets
            # XLA slice the finish transpose/interleave away, timing
            # only the planar kernels (the reference's 'frame
            # rendering time' writes the interleaved target array,
            # envutil_payload.cc:476-557, and serve ships
            # frame.tobytes() - the interleave is production cost)
            return frame_fn(*a, img.ravel()[0] * 1e-30)
        return jax.lax.fori_loop(0, runs, body, im0).ravel()[0]

    float(loop(args, img0))
    t0 = time.perf_counter()
    float(loop(args, img0))
    dt = (time.perf_counter() - t0) / runs
    # the experimental tunnel costs ~20-30ms per *invocation*
    # (dispatch + scalar fetch); 24 chained frames amortize it to
    # ~1ms/frame so the number approximates the device pipeline rate
    return n_px / 1e6 / dt


def _timeit_frame_reuse(frame_fn, state, canvas_shape, n_px, runs=24):
    """Steady-state donated-canvas loop (the serve/visor contract,
    bench.py's default since round 2): the canvas is carried through
    the chained frame loop, so no per-frame zero-fill - mirroring the
    reference's preallocated target array that zimt::process rewrites
    each frame (envutil_payload.cc:476-557)."""
    import jax
    import jax.numpy as jnp

    canvas0 = jnp.zeros(canvas_shape, jnp.float32)
    img0, canvas0 = frame_fn(state, canvas0, jnp.float32(0))
    img0 = jax.block_until_ready(img0)

    @jax.jit
    def loop(st, carry0):
        def body(i, carry):
            img, cv = carry
            # image carried: the interleaved finish materializes
            # every frame (see _timeit_frame)
            return frame_fn(st, cv, img.ravel()[0] * 1e-30)
        return jax.lax.fori_loop(0, runs, body, carry0)[0].ravel()[0]

    float(loop(state, (img0, canvas0)))
    t0 = time.perf_counter()
    float(loop(state, (img0, canvas0)))
    dt = (time.perf_counter() - t0) / runs
    return n_px / 1e6 / dt


def _report(name, mpix_s, extra="", tag=None):
    rec = {"config": name, "value": round(mpix_s, 1),
           "unit": "Mpix/s", "note": extra}
    # per-config measured XLA-CPU floor (tools/cpu_floor.py ->
    # CPU_FLOORS.json): the measured lower bracket for the reference
    # proxy, reported alongside every number (VERDICT r3 item 5)
    if tag is not None:
        import os
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "CPU_FLOORS.json")
        try:
            with open(path) as f:
                fl = json.load(f).get(tag)
            if fl:
                rec["cpu_floor_1core"] = fl["value"]
                rec["vs_cpu_floor"] = round(mpix_s / fl["value"], 1)
        except (OSError, ValueError):
            pass
    print(json.dumps(rec), flush=True)


def main():
    from envutil_tpu.runtime.platform import ensure_backend

    ensure_backend()
    import jax
    import jax.numpy as jnp

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.models import cubemap as CBM
    from envutil_tpu.models import stepper as ST
    from envutil_tpu.models import synopsis as SYN
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime import fastpath as FP
    from envutil_tpu.runtime.loader import _attach_variants
    from envutil_tpu.runtime.render import build_plan

    def make_env_source(w, h, degree, variants=True, coeff="f32"):
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

        class _A:
            verbose = False
            precise = False
        _A.spline_degree = degree
        _A.prefilter_degree = degree
        _A.coeff_dtype = coeff
        from envutil_tpu.runtime.loader import _apply_coeff_dtype
        _apply_coeff_dtype(src, _A())   # before the variant builds
        if variants:
            _attach_variants(src, fct, _A())
        _apply_coeff_dtype(src, _A())
        jax.block_until_ready(src.spl.coeff)
        return fct, src

    def make_plan(fct, projection, w, h, hfov_deg, degree, yaw=0.0,
                  pitch=0.0, twine=0, facets=None, solo=0,
                  synopsis="panorama"):
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
        args.synopsis = synopsis
        args.nchannels = 3
        args.facets = facets or [fct]
        args.solo = solo
        if twine:
            args.twine_setup()
        return args, build_plan(args, args.facets)

    shared = {}

    def solo_rate(plan, src, window, n_px, spread=None):
        """Steady-state rate of a solo fused frame: donated-canvas
        loop (finish='reuse', the serve contract) for twined frames
        with no merge passes - measured faster there (16K/16-tap
        592.0 -> 602.3, 8K/4-tap 1141.9 -> 1179.0 on one v5e chip,
        2026-08-21); fresh-canvas loop otherwise (merge passes read
        the previous canvas, and the untwined frames measured
        slightly slower under reuse: 4K bilinear 1691.6 vs 1588.3 in
        an isolated A/B)."""
        frame, state, assigned, passes = FP.fused_frame(
            plan, src, window, spread=spread)
        if spread is None or any(p[4] for p in passes):
            return _timeit_frame(frame, (state,), n_px), assigned
        ru, ru_state, _a, _p = FP.fused_frame(
            plan, src, window, spread=spread, finish="reuse")
        return _timeit_frame_reuse(ru, ru_state, ru.canvas_shape,
                                   n_px), assigned

    def cfg_4b():
        # ---- config 4b: TRUE 16K twining downscale (bf16 coefficients) --
        # runs FIRST: the 16K build needs headroom other configs' live
        # buffers would fragment away
        # the BASELINE '16K -> 2K' config: bfloat16 coefficient storage
        # keeps the four variant tables at ~3.2GB total on one chip
        fct16, src16 = make_env_source(16384, 8192, 1, coeff="bf16")
        window4b = (0, 1280, 0, 2048)
        args4b, plan4b = make_plan(fct16, Projection.RECTILINEAR, 2048,
                                   1280, 100, 1, twine=-1)
        bias = 1.0 / ST.DERIV_BIAS
        spread_b = tuple((bias * cx, bias * cy, w)
                         for cx, cy, w in args4b.twine_spread)
        mpix, assigned_b = solo_rate(plan4b, src16, window4b,
                                     2048 * 1280, spread=spread_b)
        _report(f"16K equirect (bf16 coeff) -> 2048x1280 rectilinear, "
                f"fused twining ({len(spread_b)} taps)", mpix,
                f"{(assigned_b >= 0).mean():.0%} fused", tag="4b")
        del src16


    def cfg_4c():
        # ---- config 4c: the same downscale with --twine_pyramid ---------
        # the production minify mode: twine_setup box-decimates the facet
        # until the residual minification is in [0.5, 1), so the source
        # shrinks to 16K >> L and the auto twine to <= 2x2 taps
        argsp = Args()
        argsp.projection = Projection.RECTILINEAR
        argsp.width, argsp.height = 2048, 1280
        argsp.hfov = math.radians(100)
        argsp.extent = get_extent(Projection.RECTILINEAR, 2048, 1280,
                                  argsp.hfov)
        argsp.step = (argsp.extent.x1 - argsp.extent.x0) / 2048
        argsp.twine_pyramid = True
        fdum = Facet(facet_no=0, nchannels=3)
        fdum.set_geometry(Projection.SPHERICAL, 16384, 8192, 2 * math.pi)
        fdum.process_geometry()
        argsp.facets = [fdum]
        argsp.twine_setup()
        lvl = fdum.pyramid_level
        fctp, srcp = make_env_source(16384 >> lvl, 8192 >> lvl, 1)
        args4c, plan4c = make_plan(fctp, Projection.RECTILINEAR, 2048,
                                   1280, 100, 1, twine=-1)
        bias = 1.0 / ST.DERIV_BIAS
        spread_c = tuple((bias * cx, bias * cy, w)
                         for cx, cy, w in args4c.twine_spread)
        mpix, assigned_c = solo_rate(plan4c, srcp, (0, 1280, 0, 2048),
                                     2048 * 1280, spread=spread_c)
        _report(f"16K equirect -> 2048x1280 rectilinear, --twine_pyramid "
                f"(level {lvl}, {len(spread_c)} taps)", mpix,
                f"{(assigned_c >= 0).mean():.0%} fused", tag="4c")
        del srcp



    def cfg_1():
        # ---- config 1: 4K latlon -> HD rectilinear, bilinear ------------
        fct, src = make_env_source(4096, 2048, 1)
        _, plan = make_plan(fct, Projection.RECTILINEAR, 1920, 1152, 90, 1,
                            yaw=30)
        window = (0, 1152, 0, 1920)
        mpix, assigned = solo_rate(plan, src, window, 1920 * 1152)
        _report("4K latlon -> 1920x1152 rectilinear bilinear", mpix,
                f"{(assigned >= 0).mean():.0%} fused", tag="1")


    def get_biatan6():
        """Shared biatan6 IR source for configs 3 / 3b."""
        if "biatan6" not in shared:
            faces = np.stack([np.random.rand(1024, 1024, 3)
                              .astype(np.float32) for _ in range(6)])
            cfct = Facet(facet_no=0, nchannels=3)
            cfct.set_geometry(Projection.BIATAN6, 1024, 6144,
                              math.radians(100))
            cfct.step = get_step(Projection.BIATAN6, 1024, 6144,
                                 math.radians(100))
            cfct.process_geometry()
            csrc = CBM.make_cubemap_source(cfct, faces, 3, 3, 128, 64)
            csrc.variants.update(
                CBM.section_splines(csrc.spl, csrc.static.metrics))
            jax.block_until_ready(csrc.spl.coeff)
            shared["biatan6"] = (cfct, csrc)
        return shared["biatan6"]

    def cfg_3():
        # ---- config 3: biatan6 cubemap -> stereographic sweep -----------
        cfct, csrc = get_biatan6()
        _, plan3 = make_plan(cfct, Projection.STEREOGRAPHIC, 1920, 1152,
                             150, 3, yaw=35, pitch=20)
        window3 = (0, 1152, 0, 1920)
        mpix, assigned = solo_rate(plan3, csrc, window3, 1920 * 1152)
        _report("biatan6(fov100) -> 1920x1152 stereographic deg-3 "
                "(yaw35/pitch20)", mpix,
                f"{(assigned >= 0).mean():.0%} fused", tag="3")


    def cfg_4():
        # ---- config 4: twining downscale 8K -> 2K -----------------------
        fct8, src8 = make_env_source(8192, 4096, 1)
        args4, plan4 = make_plan(fct8, Projection.RECTILINEAR, 2048, 1280,
                                 100, 1, twine=-1)
        bias = 1.0 / ST.DERIV_BIAS
        spread = tuple((bias * cx, bias * cy, w)
                       for cx, cy, w in args4.twine_spread)
        window4 = (0, 1280, 0, 2048)
        mpix, assigned = solo_rate(plan4, src8, window4, 2048 * 1280,
                                   spread=spread)
        _report(f"8K equirect -> 2048x1280 rectilinear, fused twining "
                f"({len(spread)} taps)", mpix,
                f"{(assigned >= 0).mean():.0%} fused", tag="4")


    def cfg_5():
        # ---- config 5: 3-facet voronoi stitch ----------------------------
        # three rectilinear facets at different yaws, stitched into a 4K
        # pano (facet angular resolution ~2.8x the pano's: the MINIFY
        # class territory)
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
        args5, plan5 = make_plan(facets[0], Projection.SPHERICAL, 4096,
                                 2048, 360, 3, facets=facets, solo=-1)
        window5 = (0, 2048, 0, 4096)
        frame5, states, assigneds, _pl = FP.fused_multi_frame(
            plan5, srcs, window5)
        fracs = [(a >= 0).sum() / max(int((a != FP.ZERO_PASS).sum()), 1)
                 for a in assigneds]

        mpix = _timeit_frame(frame5, (tuple(states),), 4096 * 2048)
        _report("3-facet voronoi stitch -> 4096x2048 equirect deg-3 "
                "(one-jit frame)", mpix,
                f">= {min(fracs):.0%} covered tiles fused per facet",
                tag="5")
        del srcs, states


    def cfg_2r():
        # ---- config 2r: reverse direction (cubemap -> 8K equirect) ------
        faces2 = np.stack([np.random.rand(2048, 2048, 3)
                           .astype(np.float32) for _ in range(6)])
        cfct2 = Facet(facet_no=0, nchannels=3)
        cfct2.set_geometry(Projection.CUBEMAP, 2048, 6 * 2048,
                           math.radians(90))
        cfct2.step = get_step(Projection.CUBEMAP, 2048, 6 * 2048,
                              math.radians(90))
        cfct2.process_geometry()
        csrc2 = CBM.make_cubemap_source(cfct2, faces2, 3, 3, 128, 64)
        csrc2.variants.update(CBM.section_splines(csrc2.spl, csrc2.static.metrics))
        jax.block_until_ready(csrc2.spl.coeff)
        _, plan2r = make_plan(cfct2, Projection.SPHERICAL, 8192, 4096,
                              360, 3)
        mpix, assigned = solo_rate(plan2r, csrc2, (0, 4096, 0, 8192),
                                   8192 * 4096)
        _report("6x2048 cubemap -> 8K equirect deg-3 (reverse headline)",
                mpix, f"{(assigned >= 0).mean():.0%} fused", tag="2r")


    def cfg_3b():
        # ---- config 3b: biatan6 -> fisheye sweep ------------------------
        cfct, csrc = get_biatan6()
        _, plan3b = make_plan(cfct, Projection.FISHEYE, 1920, 1152, 170,
                              3, yaw=-25, pitch=15)
        mpix, assigned = solo_rate(plan3b, csrc, (0, 1152, 0, 1920),
                                   1920 * 1152)
        _report("biatan6(fov100) -> 1920x1152 fisheye(170) deg-3 "
                "(yaw-25/pitch15)", mpix,
                f"{(assigned >= 0).mean():.0%} fused", tag="3b")


    def cfg_5b():
        # ---- config 5b: 6-facet voronoi + lens correction ---------------
        facets6, srcs6 = [], []
        for i in range(6):
            f = Facet(facet_no=i, nchannels=3)
            f.set_geometry(Projection.RECTILINEAR, 1536, 1152,
                           math.radians(72))
            f.step = get_step(Projection.RECTILINEAR, 1536, 1152,
                              math.radians(72))
            f.yaw = math.radians(60.0 * i)
            f.a, f.b, f.c = 0.01, -0.02, 0.005
            f.process_geometry()
            facets6.append(f)
            img6 = np.random.rand(1152, 1536, 3).astype(np.float32)
            srcs6.append(jax.device_put(
                E.make_mount_source(f, img6, 3, 3)))
        _a, plan5b = make_plan(facets6[0], Projection.SPHERICAL, 4096,
                               2048, 360, 3, facets=facets6, solo=-1)
        frame5b, states6, assigneds6, _pl = FP.fused_multi_frame(
            plan5b, srcs6, (0, 2048, 0, 4096))
        fr6 = [(a >= 0).sum() / max(int((a != FP.ZERO_PASS).sum()), 1)
               for a in assigneds6]
        mpix = _timeit_frame(frame5b, (tuple(states6),), 4096 * 2048)
        _report("6-facet voronoi + lens correction -> 4096x2048 deg-3 "
                "(one-jit)", mpix,
                f">= {min(fr6):.0%} covered tiles fused per facet",
                tag="5b")
        del srcs6, states6


    def cfg_5d():
        # ---- config 5d: 6-facet voronoi stitch + 4-tap twining -----------
        # the champion-stability decomposition's target: stable tiles
        # run once through their champion's union-tap twined frame;
        # only the seam/edge band pays the K-tap x F-facet loop
        facets6, srcs6 = [], []
        for i in range(6):
            f = Facet(facet_no=i, nchannels=3)
            f.set_geometry(Projection.RECTILINEAR, 1536, 1152,
                           math.radians(72))
            f.step = get_step(Projection.RECTILINEAR, 1536, 1152,
                              math.radians(72))
            f.yaw = math.radians(60.0 * i)
            f.process_geometry()
            facets6.append(f)
            img6 = np.random.rand(1152, 1536, 3).astype(np.float32)
            srcs6.append(jax.device_put(
                E.make_mount_source(f, img6, 3, 3)))
        args5d, plan5d = make_plan(facets6[0], Projection.SPHERICAL,
                                   4096, 2048, 360, 3, facets=facets6,
                                   solo=-1, twine=1)
        got = FP.fused_pertap_frame(plan5d, srcs6, (0, 2048, 0, 4096),
                                    verbose=True)
        if got is None:
            _report("6-facet voronoi + 4-tap twine (pertap declined)",
                    0.0)
            return
        fn, fargs = got
        sts, ssts, tsts, sp, up = fargs
        wrapped = lambda s, ss, ts, spv, upv, eps: fn(s, ss, ts,
                                                      spv + eps, upv)
        mpix = _timeit_frame(wrapped, (sts, ssts, tsts, sp, up),
                             4096 * 2048)
        _report("6-facet voronoi stitch + 4-tap twine -> 4096x2048 "
                "deg-3 (champion-stable one-jit)", mpix, tag="5d")
        del srcs6, sts, ssts, tsts


    def cfg_5c():
        # ---- config 5c: 3-bracket HDR merge -----------------------------
        facets_h, srcs_h = [], []
        for i, eev in enumerate((-2.0, 0.0, 2.0)):
            f = Facet(facet_no=i, nchannels=3)
            f.set_geometry(Projection.SPHERICAL, 4096, 2048, 2 * math.pi)
            f.step = get_step(Projection.SPHERICAL, 4096, 2048,
                              2 * math.pi)
            f.process_geometry()
            facets_h.append(f)
            img_h = (np.random.rand(2048, 4096, 3).astype(np.float32)
                     * 2.0 ** eev)
            s = E.make_mount_source(f, img_h, 3, 3)
            import dataclasses as _dc
            s.static = _dc.replace(s.static, brighten=2.0 ** -eev)
            srcs_h.append(jax.device_put(s))
        args_h, plan_h = make_plan(facets_h[0], Projection.SPHERICAL,
                                   4096, 2048, 360, 3, facets=facets_h,
                                   solo=-1, synopsis="hdr_merge")
        frame_h, states_h, assigneds_h, _pl = FP.fused_multi_frame(
            plan_h, srcs_h, (0, 2048, 0, 4096))
        mpix = _timeit_frame(frame_h, (tuple(states_h),), 4096 * 2048)
        _report("3-bracket HDR merge -> 4096x2048 deg-3 (one-jit)", mpix,
                tag="5c")




    only = [a for a in sys.argv[1:] if not a.startswith('-')]
    configs = [('4b', cfg_4b), ('4c', cfg_4c), ('1', cfg_1), ('3', cfg_3), ('4', cfg_4), ('5', cfg_5), ('2r', cfg_2r), ('3b', cfg_3b), ('5b', cfg_5b), ('5d', cfg_5d), ('5c', cfg_5c)]
    for tag, fn in configs:
        if not only or tag in only:
            fn()


if __name__ == "__main__":
    main()
