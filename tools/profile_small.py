"""Break down config-1 (4K latlon -> HD rectilinear bilinear): where
does a small frame's time go?"""

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
from envutil_tpu.runtime.loader import _attach_variants
from envutil_tpu.runtime.render import build_plan
from envutil_tpu.runtime import fastpath as FP
from envutil_tpu.ops import pallas_resample as PR


def timed(fn, *args, runs=16):
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
    w, h = 4096, 2048
    yy, xx = np.meshgrid(np.linspace(0, 1, h, dtype=np.float32),
                         np.linspace(0, 1, w, dtype=np.float32),
                         indexing="ij")
    img = np.stack([xx, yy, xx * yy], axis=-1)
    fct = Facet(facet_no=0, nchannels=3)
    fct.set_geometry(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.step = get_step(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.process_geometry()
    src = jax.device_put(E.make_mount_source(fct, img, 1, 1))

    class _A:
        verbose = False
        precise = False
        spline_degree = 1
        prefilter_degree = 1
    _attach_variants(src, fct, _A())
    jax.block_until_ready(src.spl.coeff)

    args = Args()
    args.projection = Projection.RECTILINEAR
    args.width, args.height = 1920, 1152
    args.hfov = math.radians(90)
    args.extent = get_extent(args.projection, 1920, 1152, args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / 1920
    args.yaw = math.radians(30)
    args.spline_degree = args.prefilter_degree = 1
    args.twine = 0
    args.synopsis = "panorama"
    args.nchannels = 3
    args.facets = [fct]
    args.solo = 0
    plan = build_plan(args, [fct])
    window = (0, 1152, 0, 1920)

    passes, assigned = FP.plan_passes(plan, src, window,
                                      FP.DEFAULT_CLASSES)
    print("passes:", [(n, wc.name, t.shape[0])
                      for n, wc, _b, t, _m in passes])
    geom = FP._geom_static(plan)
    basis = FP._basis_arg(plan, 0)

    # coords over the full window
    def f_coords(carry, b):
        c = FP._coords(geom, window, "orig", src, 0, (0.0, 0.0),
                       b + carry * 0)
        return c[0]
    print(f"coords: {timed(f_coords, basis)*1e3:6.2f} ms")

    # kernel passes only, one donated canvas chain inside one jit
    c0 = FP._coords(geom, window, "orig", src, 0, (0.0, 0.0), basis)
    sx, sy = jax.block_until_ready((c0[0], c0[1]))
    coeffs = {}
    for name, wc, box, tiles, _m in passes:
        if name not in coeffs:
            coeffs[name] = jnp.moveaxis(
                FP._variant_spline(src, name).coeff, -1, 0)

    def f_kern(carry, a, b):
        canvas = jnp.zeros((3, 1152, 1920), jnp.float32)
        for pi, (name, wc, box, tiles, _m) in enumerate(passes):
            canvas = PR.resample_planar_into(
                canvas, coeffs[name], a + carry * 1e-30, b,
                jnp.asarray(tiles), degree=1, wc=wc,
                unroll=(wc not in (PR.DIAG, PR.SHEAR4)))
        return canvas
    print(f"kern passes: {timed(f_kern, sx, sy)*1e3:6.2f} ms")

    frame_fn, state, assigned2, _p = FP.fused_frame(plan, src, window)

    def f_frame(carry, st):
        return frame_fn(st, carry * 1e-30)
    dt = timed(f_frame, state)
    n_px = 1920 * 1152
    print(f"frame: {dt*1e3:6.2f} ms ({n_px/1e6/dt:.0f} Mpix/s)")


if __name__ == "__main__":
    main()
