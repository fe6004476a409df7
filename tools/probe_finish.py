"""Quantify the non-kernel parts of the headline frame on the real
chip: canvas zeros, the planar->interleaved finish transpose, and the
frame with each removed. Development tool (run via tools/tpu_session.sh
or standalone; serialize against other tunnel users).

Variants timed (chained loop, like bench.py):
  frame        the production fused frame (bench.py's program)
  planar       same passes, but return the (C, H, W) canvas - no
               moveaxis/repix finish (what a planar-to-host pipeline
               would time)
  reuse        canvas carried through the loop and donated instead of
               re-zeroed per frame (valid when every pass writes full
               tiles: no merge passes - true for the headline)
  zeros        jnp.zeros((C, H, W)) alone
  transpose    moveaxis (C,H,W)->(H,W,C) alone
"""

import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from envutil_tpu.core.conventions import Projection
from envutil_tpu.core.facet import Facet
from envutil_tpu.core.metrics import get_extent, get_step
from envutil_tpu.models import environment as E
from envutil_tpu.runtime.args import Args
from envutil_tpu.runtime.render import build_plan
from envutil_tpu.runtime import fastpath as FP


def timed(fn, *args, runs=24):
    @jax.jit
    def loop(*a):
        def body(i, carry):
            out = fn(carry, *a)
            return carry + out.ravel()[0] * 1e-30
        return jax.lax.fori_loop(0, runs, body, jnp.float32(0))

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / runs


def main():
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
    from envutil_tpu.runtime.loader import _attach_variants

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
    args.spline_degree = 3
    args.prefilter_degree = 3
    args.twine = 0
    args.synopsis = "panorama"
    args.nchannels = 3
    args.facets = [fct]
    args.solo = 0
    plan = build_plan(args, [fct])
    window = (0, plan.height, 0, plan.width)
    n_px = plan.width * plan.height

    frame_fn, state, assigned, passes = FP.fused_frame(
        plan, src, window)
    merges = [bool(p[4]) for p in passes]
    print(f"passes: {len(passes)}, any merge: {any(merges)}, "
          f"fused {(assigned >= 0).sum()}/{assigned.size}")

    def f_frame(carry, st):
        return frame_fn(st, carry * 1e-30)
    dt = timed(f_frame, state)
    print(f"frame     : {dt*1e3:7.2f} ms  {n_px/1e6/dt:7.0f} Mpix/s")

    # planar variant: the pass chain without the finish
    pl_fn, pl_state, _a2, _p2 = FP.fused_frame(
        plan, src, window, finish="planar")

    def f_planar(carry, st):
        return pl_fn(st, carry * 1e-30)
    dt_p = timed(f_planar, pl_state)
    print(f"planar    : {dt_p*1e3:7.2f} ms  {n_px/1e6/dt_p:7.0f} "
          f"Mpix/s")

    # canvas reuse: donate the previous frame's canvas (no merge
    # passes in the headline -> every assigned tile fully rewritten)
    ru_fn, ru_state, _a3, _p3 = FP.fused_frame(
        plan, src, window, finish="reuse")
    canvas0 = jnp.zeros(ru_fn.canvas_shape, jnp.float32)

    @jax.jit
    def loop_reuse(st, cv):
        def body(i, carry):
            acc, cv = carry
            img, cv = ru_fn(st, cv, acc * 1e-30)
            return acc + img.ravel()[0] * 1e-30, cv
        return jax.lax.fori_loop(0, 24, body,
                                 (jnp.float32(0), cv))[0]

    float(loop_reuse(ru_state, canvas0))
    t0 = time.perf_counter()
    float(loop_reuse(ru_state, canvas0))
    dt_r = (time.perf_counter() - t0) / 24
    print(f"reuse     : {dt_r*1e3:7.2f} ms  {n_px/1e6/dt_r:7.0f} "
          f"Mpix/s")

    def f_zeros(carry):
        return jnp.zeros((3, plan.height, plan.width),
                         jnp.float32) + carry * 1e-30
    dt_z = timed(f_zeros)
    print(f"zeros     : {dt_z*1e3:7.2f} ms")

    cv = jnp.array(np.zeros((3, plan.height, plan.width), np.float32))

    def f_tr(carry, c):
        return jnp.moveaxis(c + carry * 1e-30, 0, -1)
    dt_t = timed(f_tr, cv)
    print(f"transpose : {dt_t*1e3:7.2f} ms")

    # sanity: reuse/planar match the production frame
    ref = np.moveaxis(np.asarray(pl_fn(pl_state, jnp.float32(0))),
                      0, -1)
    out = np.asarray(frame_fn(state, jnp.float32(0)))
    print(f"planar==frame: {np.array_equal(ref, out)}")
    img2, _cv = ru_fn(ru_state, canvas0, jnp.float32(0))
    print(f"reuse==frame : {np.array_equal(np.asarray(img2), out)}")


if __name__ == "__main__":
    main()
