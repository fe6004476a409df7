"""Break down the 3-facet stitch frame (benchmarks config 5)."""

import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from envutil_tpu.core.conventions import Projection
from envutil_tpu.core.facet import Facet
from envutil_tpu.core.metrics import get_extent, get_step
from envutil_tpu.models import environment as E
from envutil_tpu.models import synopsis as SYN
from envutil_tpu.runtime.args import Args
from envutil_tpu.runtime.render import build_plan
from envutil_tpu.runtime import fastpath as FP


def timed(fn, *args, runs=6):
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
    args = Args()
    args.projection = Projection.SPHERICAL
    args.width, args.height = 4096, 2048
    args.hfov = math.radians(360)
    args.extent = get_extent(args.projection, 4096, 2048, args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / 4096
    args.spline_degree = args.prefilter_degree = 3
    args.twine = 0
    args.synopsis = "panorama"
    args.nchannels = 3
    args.facets = facets
    args.solo = -1
    plan = build_plan(args, facets)
    window = (0, 2048, 0, 4096)
    geom = FP._geom_static(plan)

    # per-facet raw fused frames
    for fi, src in enumerate(srcs):
        frame, st, assigned, passes, key = FP._frame_builder(
            plan, src, window, fi=fi)
        mix = ", ".join(f"{n}/{wc.name}:{(assigned == pi).sum()}"
                        for pi, (n, wc, _b, _t, _m) in enumerate(passes))
        print(f"facet {fi}: unfused={(assigned == -1).sum()} "
              f"({mix})")
        fn = jax.jit(frame)
        dt = timed(lambda eps, s: fn(s, eps), st)
        print(f"  facet frame: {dt*1e3:7.2f} ms")

        basis = FP._basis_arg(plan, fi)

        def f_coords(eps, b):
            c = FP._coords(geom, window, "orig", src, fi, (0.0, 0.0),
                           b + eps * 0)
            return c[3]
        dt = timed(f_coords, basis)
        print(f"  mask/score coords: {dt*1e3:7.2f} ms")

    # synopsis combine alone
    px = [jnp.zeros((2048, 4096, 3), jnp.float32) for _ in range(3)]
    mk = [jnp.ones((2048, 4096), bool) for _ in range(3)]
    sc = [jnp.zeros((2048, 4096), jnp.float32) for _ in range(3)]

    def f_comb(eps, px0):
        return SYN.voronoi_stack(jnp.stack([px0 + eps] + px[1:]),
                                 jnp.stack(mk), jnp.stack(sc))
    dt = timed(f_comb, px[0])
    print(f"voronoi combine: {dt*1e3:7.2f} ms")

    fn, states, assigneds, _pl = FP.fused_multi_frame(plan, srcs,
                                                      window)
    dt = timed(lambda eps, s: fn(s, eps), tuple(states))
    print(f"one-jit multi frame: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
