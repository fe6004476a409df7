"""Break down the twined downscale frame (benchmarks config 4:
8K equirect -> 2048x1280 rectilinear, auto twine): whole frame vs a
single-tap variant vs n_taps sweep, to localize the per-tap device
cost. Development tool."""

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
from envutil_tpu.models import stepper as ST
from envutil_tpu.runtime.args import Args
from envutil_tpu.runtime.render import build_plan
from envutil_tpu.runtime import fastpath as FP


def timeit_frame(frame_fn, args, runs=24):
    @jax.jit
    def loop(*a):
        def body(i, carry):
            img = frame_fn(*a, carry * 1e-30)
            return carry + img.ravel()[0]
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
    img = np.stack([xx, yy, xx * yy], axis=-1)
    fct = Facet(facet_no=0, nchannels=3)
    fct.set_geometry(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.step = get_step(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.process_geometry()
    src = jax.device_put(E.make_mount_source(fct, img, 1, 1))

    from envutil_tpu.runtime.loader import _attach_variants

    class _A:
        verbose = False
        precise = False
        spline_degree = 1
        prefilter_degree = 1
        coeff_dtype = "f32"
    _attach_variants(src, fct, _A())
    jax.block_until_ready(src.spl.coeff)

    args = Args()
    args.projection = Projection.RECTILINEAR
    args.width, args.height = 2048, 1280
    args.hfov = math.radians(100)
    args.extent = get_extent(args.projection, 2048, 1280, args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / 2048
    args.spline_degree = args.prefilter_degree = 1
    args.twine = -1
    args.synopsis = "panorama"
    args.nchannels = 3
    args.facets = [fct]
    args.solo = 0
    args.twine_setup()
    plan = build_plan(args, [fct])
    window = (0, 1280, 0, 2048)
    bias = 1.0 / ST.DERIV_BIAS
    spread = tuple((bias * cx, bias * cy, wt)
                   for cx, cy, wt in args.twine_spread)
    n_px = 2048 * 1280

    print(f"auto twine: {len(spread)} taps", flush=True)
    # full K-tap frame
    frame, state, assigned, passes = FP.fused_frame(
        plan, src, window, spread=spread)
    mix = ", ".join(f"{n}/{wc.name}:{(assigned == pi).sum()}"
                    for pi, (n, wc, *_r) in enumerate(passes))
    print(f"passes: {mix}", flush=True)
    dt = timeit_frame(frame, (state,))
    print(f"K={len(spread)}: {dt*1e3:7.2f} ms "
          f"({n_px/1e6/dt:6.1f} Mpix/s)", flush=True)

    # reduced-tap variants of the same spread (same classification
    # budgets: keep the full spread for planning, truncate + renorm
    # the evaluated taps)
    for k in (1, 2, 4):
        if k >= len(spread):
            continue
        sub = list(spread[:k])
        tot = sum(wt for _c, _d, wt in sub)
        sub = tuple((cx, cy, wt / tot) for cx, cy, wt in sub)
        # classify against the FULL footprint so the pass structure
        # stays comparable; evaluate only k taps
        frame_k, state_k, _a, _p = FP.fused_frame(
            plan, src, window, spread=tuple(spread[:k]))
        dt = timeit_frame(frame_k, (state_k,))
        print(f"K={k}: {dt*1e3:7.2f} ms ({n_px/1e6/dt:6.1f} Mpix/s)",
              flush=True)

    # non-twined baseline (same geometry)
    args0, plan0 = args, None
    args2 = Args()
    for f in ("projection", "width", "height", "hfov", "extent",
              "step", "spline_degree", "prefilter_degree",
              "synopsis", "nchannels", "facets", "solo"):
        setattr(args2, f, getattr(args, f))
    args2.twine = 0
    plan0 = build_plan(args2, [fct])
    frame0, state0, _a0, _p0 = FP.fused_frame(plan0, src, window)
    dt = timeit_frame(frame0, (state0,))
    print(f"K=0 (plain): {dt*1e3:7.2f} ms "
          f"({n_px/1e6/dt:6.1f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main()
