"""TPU correctness check: fused fast path (SMEM origins + dbuf) and
per-tap twined multi-facet path vs the exact XLA graph, on small
frames. Development tool.

ENVUTIL_PLATFORM=cpu ENVUTIL_INTERPRET=1 runs the same checks on the
CPU backend with the kernels in Pallas interpreter mode (no TPU / no
axon tunnel needed; slow - use while hardware is unavailable)."""

import math
import os
import sys

import numpy as np

if os.environ.get("ENVUTIL_PLATFORM"):
    # must precede backend initialization (the axon site force-sets
    # jax_platforms at import; the JAX_PLATFORMS env var is ignored)
    import jax

    jax.config.update("jax_platforms", os.environ["ENVUTIL_PLATFORM"])


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64)
                   - np.asarray(b, np.float64)) ** 2)
    return 10 * math.log10(1.0 / mse) if mse > 0 else 999.0


def main():
    from envutil_tpu.runtime.platform import ensure_backend

    ensure_backend()
    import jax
    import jax.numpy as jnp

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.runtime import fastpath
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.render import (_compiled_window,
                                            build_plan)

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(7)

    def mk_facet(w, h, yaw, seed):
        img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        fct = Facet(facet_no=seed, nchannels=3)
        fct.set_geometry(Projection.SPHERICAL, w, h, 2 * math.pi)
        fct.step = get_step(Projection.SPHERICAL, w, h, 2 * math.pi)
        fct.yaw = yaw
        fct.process_geometry()
        src = E.make_mount_source(fct, img, 3, 3)
        return fct, src

    def mk_args(width, height, twine):
        args = Args()
        args.projection = Projection.RECTILINEAR
        args.width, args.height = width, height
        args.hfov = math.radians(80)
        args.extent = get_extent(args.projection, width, height,
                                 args.hfov)
        args.step = (args.extent.x1 - args.extent.x0) / width
        args.spline_degree = args.prefilter_degree = 3
        args.nchannels = 3
        args.twine = twine
        if twine:
            args.twine_spread = [(-0.25, -0.25, 0.25),
                                 (0.25, -0.25, 0.25),
                                 (-0.25, 0.25, 0.25),
                                 (0.25, 0.25, 0.25)]
        return args

    ok = True

    # --- solo fused frame vs XLA -------------------------------------
    fct, src = mk_facet(1024, 512, 0.0, 0)
    args = mk_args(256, 256, 0)
    args.facets = [fct]
    args.solo = 0
    plan = build_plan(args, [fct])
    fused = fastpath.render_fast(plan, [src], verbose=True)
    xla = np.asarray(_compiled_window(plan, (0, 256, 0, 256))([src]))
    p = psnr(fused, xla)
    print(f"solo fused vs XLA: PSNR {p:.1f} dB", flush=True)
    ok &= p > 60.0

    # --- finish modes: planar / reuse frames match the image frame --
    win = (0, 256, 0, 256)
    f_img, st, _a, passes = fastpath.fused_frame(plan, src, win)
    base = np.asarray(f_img(st, jnp.float32(0)))
    f_pl, st_pl, _a, _p = fastpath.fused_frame(plan, src, win,
                                               finish="planar")
    planar = np.moveaxis(np.asarray(f_pl(st_pl, jnp.float32(0))),
                         0, -1)
    same_pl = np.array_equal(planar, base)
    print(f"finish=planar matches image: {same_pl}", flush=True)
    ok &= same_pl
    if not any(ps[4] for ps in passes):
        f_ru, st_ru, _a, _p = fastpath.fused_frame(plan, src, win,
                                                   finish="reuse")
        canvas = jnp.zeros(f_ru.canvas_shape, jnp.float32)
        _img1, canvas = f_ru(st_ru, canvas, jnp.float32(0))
        img2, canvas = f_ru(st_ru, canvas, jnp.float32(0))
        same_ru = np.array_equal(np.asarray(img2), base)
        print(f"finish=reuse matches image: {same_ru}", flush=True)
        ok &= same_ru

    # --- per-tap twined multi-facet vs XLA ---------------------------
    fct0, src0 = mk_facet(768, 384, 0.0, 1)
    # a partial facet (not full 360) so validity masks cut in
    img1 = rng.uniform(0, 1, (384, 512, 3)).astype(np.float32)
    fct1 = Facet(facet_no=1, nchannels=3)
    fct1.set_geometry(Projection.RECTILINEAR, 512, 384,
                      math.radians(100))
    fct1.step = get_step(Projection.RECTILINEAR, 512, 384,
                         math.radians(100))
    fct1.yaw = math.radians(20.0)
    fct1.process_geometry()
    src1 = E.make_mount_source(fct1, img1, 3, 3)

    args = mk_args(256, 256, 1)
    args.facets = [fct0, fct1]
    args.solo = -1
    plan = build_plan(args, [fct0, fct1])
    fused = fastpath.render_fast(plan, [src0, src1], verbose=True)
    if fused is None:
        print("multi/pertap: not eligible?!")
        sys.exit(1)
    xla = np.asarray(
        _compiled_window(plan, (0, 256, 0, 256))([src0, src1]))
    p = psnr(fused, xla)
    print(f"multi pertap fused vs XLA: PSNR {p:.1f} dB", flush=True)
    ok &= p > 55.0

    # --- solo twined render of a partial facet: masked-merge passes
    # through the twined kernel ------------------------------------
    argsst = mk_args(256, 256, 1)
    argsst.facets = [fct1]
    argsst.solo = 0
    planst = build_plan(argsst, [fct1])
    fused = fastpath.render_fast(planst, [src1], verbose=True)
    if fused is not None:
        xla = np.asarray(
            _compiled_window(planst, (0, 256, 0, 256))([src1]))
        p = psnr(fused, xla)
        print(f"solo twined partial fused vs XLA: PSNR {p:.1f} dB",
              flush=True)
        ok &= p > 55.0
    else:
        print("solo twined partial: fused path declined (XLA used)")

    # --- non-twined multi with a partial facet: exercises the
    # masked-merge passes (facet-edge tiles written by validity
    # dominance) on real hardware ---------------------------------
    args = mk_args(256, 256, 0)
    args.facets = [fct0, fct1]
    args.solo = -1
    plan = build_plan(args, [fct0, fct1])
    fused = fastpath.render_fast(plan, [src0, src1], verbose=True)
    if fused is None:
        print("multi masked-merge: not eligible?!")
        sys.exit(1)
    xla = np.asarray(
        _compiled_window(plan, (0, 256, 0, 256))([src0, src1]))
    p = psnr(fused, xla)
    print(f"multi masked-merge fused vs XLA: PSNR {p:.1f} dB",
          flush=True)
    ok &= p > 60.0

    check_cubemap_source()
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)




def check_cubemap_source():
    """Cubemap/biatan6 source through the fused path (incl. the
    forced-face section variants) vs the exact XLA graph."""
    import jax
    import numpy as np

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import cubemap as CBM
    from envutil_tpu.runtime import fastpath
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.render import build_plan, render_frame

    rng = np.random.default_rng(5)
    faces = np.stack([rng.uniform(0, 1, (256, 256, 3))
                      .astype(np.float32) for _ in range(6)])
    for proj in (Projection.CUBEMAP, Projection.BIATAN6):
        cfct = Facet(facet_no=0, nchannels=3)
        cfct.set_geometry(proj, 256, 6 * 256, math.pi / 2)
        cfct.step = get_step(proj, 256, 6 * 256, math.pi / 2)
        cfct.process_geometry()
        csrc = CBM.make_cubemap_source(cfct, faces, 3, 3, 64, 32)
        csrc.variants.update(
            CBM.section_splines(csrc.spl, csrc.static.metrics))
        args = Args()
        args.projection = Projection.SPHERICAL
        args.width, args.height = 1024, 512
        args.hfov = 2 * math.pi
        args.extent = get_extent(args.projection, 1024, 512,
                                 args.hfov)
        args.step = (args.extent.x1 - args.extent.x0) / 1024
        args.spline_degree = args.prefilter_degree = 3
        args.twine = 0
        args.synopsis = "panorama"
        args.nchannels = 3
        args.facets = [cfct]
        args.solo = 0
        plan = build_plan(args, [cfct])
        fused = fastpath.render_fast(plan, [csrc], verbose=True)
        assert fused is not None, "cubemap fast path did not engage"
        from envutil_tpu.runtime.render import _compiled_window
        exact = np.asarray(_compiled_window(
            plan, (0, plan.height, 0, plan.width))([csrc]))
        p = psnr(fused, exact)
        print(f"{proj.name} source fused vs XLA: PSNR {p:.1f} dB",
              flush=True)
        assert p > 50.0, f"{proj.name}: {p}"


if __name__ == "__main__":
    main()
