"""Break down the headline frame: per-pass kernel time, coordinate
time, finish time. Development tool."""

import json
import math
import sys
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
from envutil_tpu.ops import pallas_resample as PR


def timed(fn, *args, runs=8):
    """Chained-loop timing: fn must map (carry, *args) -> array."""
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

    passes, assigned = FP.plan_passes(plan, src, window,
                                      FP.DEFAULT_CLASSES)
    geom = FP._geom_static(plan)
    basis = FP._basis_arg(plan, 0)

    print("pass mix:")
    for pi, (name, wc, box, tiles, _m) in enumerate(passes):
        print(f"  {pi}: {name}/{wc.name} box={box} nt={tiles.shape[0]}")

    # 1. coords per pass (what the fused frame recomputes per pass)
    total_coords = 0.0
    for pi, (name, wc, box, tiles, _m) in enumerate(passes):
        bwin = FP._box_window(window, box)

        def f_coords(carry, b):
            c = FP._coords(geom, bwin, name, src, 0, (0.0, 0.0),
                           b + carry * 0)
            return c[0]
        dt = timed(f_coords, basis)
        total_coords += dt
        npx = (bwin[1] - bwin[0]) * (bwin[3] - bwin[2])
        print(f"  coords {pi} ({name}, {npx/1e6:.1f}Mpx): "
              f"{dt*1e3:7.3f} ms")

    # 2. kernel per pass (static coords, eps defeats hoisting)
    total_kern = 0.0
    canvas = jnp.zeros((3, plan.height, plan.width), jnp.float32)
    for pi, (name, wc, box, tiles, _m) in enumerate(passes):
        bwin = FP._box_window(window, box)
        c0 = FP._coords(geom, bwin, name, src, 0, (0.0, 0.0), basis)
        sx, sy = jax.block_until_ready((c0[0], c0[1]))
        coeff = jnp.moveaxis(FP._variant_spline(src, name).coeff,
                             -1, 0)
        tl = jnp.asarray(tiles)

        def f_kern(carry, cv, cf, a, b, t):
            return PR.resample_planar_into(cv, cf, a + carry * 1e-30,
                                           b, t, degree=3, wc=wc)
        dt = timed(f_kern, canvas, coeff, sx, sy, tl)
        total_kern += dt
        nt = tiles.shape[0]
        print(f"  kern {pi} ({wc.name}, nt={nt}): {dt*1e3:7.3f} ms "
              f"({dt/nt*1e6:6.1f} us/tile)")

    # 3. full fused frame (as bench measures it)
    frame_fn, state, assigned2, _p = FP.fused_frame(plan, src, window)

    def f_frame(carry, st):
        return frame_fn(st, carry * 1e-30)
    dt_frame = timed(f_frame, state)

    n_px = plan.width * plan.height
    print(f"\ncoords total: {total_coords*1e3:.2f} ms")
    print(f"kernel total: {total_kern*1e3:.2f} ms")
    print(f"frame (bench): {dt_frame*1e3:.2f} ms "
          f"({n_px/1e6/dt_frame:.0f} Mpix/s)")


if __name__ == "__main__":
    main()
