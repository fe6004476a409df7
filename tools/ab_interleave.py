"""A/B the in-kernel interleaved finish on the real chip.

Builds the headline config (8K equirect -> 6x2048 cubemap, degree 3),
renders one fused frame with the interleaved emit ON (default
admission forced via PR._ILV_ON) and OFF, asserts bit-equality,
then times both under the materialized-finish steady-state loop
(the bench.py contract).

Run: python tools/ab_interleave.py [runs]
"""

import math
import os
import sys
import time

import numpy as np


def build():
    import jax
    import jax.numpy as jnp

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.render import build_plan
    from envutil_tpu.runtime.loader import _attach_variants

    w, h = 8192, 4096
    yy, xx = np.meshgrid(np.linspace(0, 1, h, dtype=np.float32),
                         np.linspace(0, 1, w, dtype=np.float32),
                         indexing="ij")
    img = np.stack([xx, yy, (xx * yy)], axis=-1)
    fct = Facet(facet_no=0, nchannels=3)
    fct.set_geometry(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.step = get_step(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.process_geometry()
    src = jax.device_put(E.make_mount_source(fct, img, 3, 3))
    jax.block_until_ready(src.spl.coeff)

    class _A:
        verbose = False
        precise = False
        spline_degree = 3
        prefilter_degree = 3
    _attach_variants(src, fct, _A())
    jax.block_until_ready(src.variants)

    args = Args()
    args.projection = Projection.CUBEMAP
    args.width, args.height = 2048, 6 * 2048
    args.hfov = math.pi / 2
    args.extent = get_extent(Projection.CUBEMAP, 2048, 6 * 2048,
                             args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / args.width
    args.spline_degree = args.prefilter_degree = 3
    args.twine = 0
    args.synopsis = "panorama"
    args.nchannels = 3
    args.facets = [fct]
    args.solo = 0
    plan = build_plan(args, [fct])
    return plan, src


def time_reuse(plan, src, window, classes, runs):
    import jax
    import jax.numpy as jnp
    from envutil_tpu.runtime.fastpath import fused_frame

    ru_fn, ru_state, _a, _p = fused_frame(plan, src, window, classes,
                                          finish="reuse")
    canvas0 = jnp.zeros(ru_fn.canvas_shape, jnp.float32)
    img0, canvas0 = ru_fn(ru_state, canvas0, jnp.float32(0))
    img0 = jax.block_until_ready(img0)

    if len(ru_fn.canvas_shape) == 2:
        # interleaved finish: the canvas IS the finished (H, W, 3)
        # frame (same bytes). Carrying a separate bitcast view would
        # force XLA to copy the canvas to preserve the alias - carry
        # only the canvas and chain through its first element
        @jax.jit
        def loop(st, cv0):
            def body(i, cv):
                _img, cv = ru_fn(st, cv, cv.ravel()[0] * 1e-30)
                return cv
            return jax.lax.fori_loop(0, runs, body,
                                     cv0).ravel()[0]

        carry = canvas0
    else:
        @jax.jit
        def loop(st, carry0):
            def body(i, carry):
                img, cv = carry
                return ru_fn(st, cv, img.ravel()[0] * 1e-30)
            return jax.lax.fori_loop(0, runs, body,
                                     carry0)[0].ravel()[0]

        carry = (img0, canvas0)
    float(loop(ru_state, carry))
    t0 = time.perf_counter()
    float(loop(ru_state, carry))
    return (time.perf_counter() - t0) / runs


def main():
    from envutil_tpu.runtime.platform import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp
    from envutil_tpu.runtime import fastpath as FP

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    plan, src = build()
    window = (0, plan.height, 0, plan.width)
    classes = FP.select_classes(plan, src, window)
    n_px = plan.width * plan.height

    FP.PR._ILV_ON = False
    fn_pl, st_pl, _a1, _p1 = FP.fused_frame(plan, src, window,
                                            classes)
    img_pl = np.asarray(jax.block_until_ready(
        fn_pl(st_pl, jnp.float32(0))))
    dt_pl = time_reuse(plan, src, window, classes, runs)

    FP.PR._ILV_ON = True
    fn_il, st_il, _a2, _p2 = FP.fused_frame(plan, src, window,
                                            classes)
    img_il = np.asarray(jax.block_until_ready(
        fn_il(st_il, jnp.float32(0))))
    dt_il = time_reuse(plan, src, window, classes, runs)

    same = np.array_equal(img_pl, img_il)
    print(f"bit-equal: {same}; max|d| = "
          f"{np.abs(img_pl - img_il).max()}")
    print(f"planar finish:      {dt_pl * 1e3:8.3f} ms/frame  "
          f"{n_px / 1e6 / dt_pl:8.1f} Mpix/s")
    print(f"interleaved finish: {dt_il * 1e3:8.3f} ms/frame  "
          f"{n_px / 1e6 / dt_il:8.1f} Mpix/s")
    assert same


if __name__ == "__main__":
    main()
