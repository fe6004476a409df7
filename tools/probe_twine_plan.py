"""Host-side (CPU backend) pass-composition probe for the twined
benchmark configs: builds the 16K->2K twining plan (benchmarks.py
cfg_4b geometry) and prints which window class each pass lands in,
with the cost model's per-pass cycle estimate - so kernel-class tuning
does not need a 15-minute TPU compile round trip per experiment.

Usage: ENVUTIL_PLATFORM=cpu python tools/probe_twine_plan.py [4b|4|5t]
"""

import math
import os
import sys

os.environ.setdefault("ENVUTIL_PLATFORM", "cpu")


def main():
    from envutil_tpu.runtime.platform import ensure_backend
    ensure_backend()
    import jax
    import numpy as np

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.models import stepper as ST
    from envutil_tpu.runtime import fastpath as FP
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.loader import _attach_variants
    from envutil_tpu.runtime.render import build_plan

    which = sys.argv[1] if len(sys.argv) > 1 else "4b"

    if which == "4b":
        w, h, degree, coeff = 16384, 8192, 1, "bf16"
        tw, th, hfov = 2048, 1280, 100
    elif which == "4":
        w, h, degree, coeff = 8192, 4096, 1, "f32"
        tw, th, hfov = 2048, 1280, 100
    else:
        raise SystemExit(f"unknown config {which}")

    yy, xx = np.meshgrid(np.linspace(0, 1, h, dtype=np.float32),
                         np.linspace(0, 1, w, dtype=np.float32),
                         indexing="ij")
    img = np.stack([xx, yy, xx * yy], axis=-1)
    fct = Facet(facet_no=0, nchannels=3)
    fct.set_geometry(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.step = get_step(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.process_geometry()
    src = E.make_mount_source(fct, img, degree, degree)

    class _A:
        verbose = False
        precise = False
    _A.spline_degree = degree
    _A.prefilter_degree = degree
    _A.coeff_dtype = coeff
    from envutil_tpu.runtime.loader import _apply_coeff_dtype
    _apply_coeff_dtype(src, _A())
    _attach_variants(src, fct, _A())
    _apply_coeff_dtype(src, _A())

    args = Args()
    args.projection = Projection.RECTILINEAR
    args.width, args.height = tw, th
    args.hfov = math.radians(hfov)
    args.extent = get_extent(args.projection, tw, th, args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / tw
    args.spline_degree = degree
    args.prefilter_degree = degree
    args.twine = -1
    args.nchannels = 3
    args.facets = [fct]
    args.twine_setup()
    plan = build_plan(args, args.facets)

    bias = 1.0 / ST.DERIV_BIAS
    spread = tuple((bias * cx, bias * cy, wgt)
                   for cx, cy, wgt in args.twine_spread)
    window = (0, th, 0, tw)
    n_taps = len(spread)
    print(f"config {which}: {w}x{h} deg{degree} {coeff} -> {tw}x{th}, "
          f"{n_taps} taps")

    nch = src.spl.coeff.shape[-1]
    itemsize = src.spl.coeff.dtype.itemsize
    for label, classes in (("coarse", FP.COARSE_CLASSES),
                           ("default", FP.DEFAULT_CLASSES)):
        passes, assigned = FP.plan_passes(plan, src, window, classes,
                                          0, spread)
        cost = FP._plan_cost_cycles(passes, assigned, src, n_taps)
        print(f"--- ladder {label}: {len(passes)} passes, "
              f"est {cost / 940e3:.2f} ms, "
              f"{(assigned < 0).sum()} tiles unfused")
        for name, wc, _box, tiles, merge in passes:
            deg = FP._variant_spline(src, name).degree
            c1 = FP._tile_cost_cycles(wc, deg, nch, itemsize, n_taps)
            print(f"  {name:>10s} {wc.name:<28s} {tiles.shape[0]:4d} "
                  f"tiles  {c1 * tiles.shape[0] / 940e3:7.2f} ms"
                  f"{'  MERGE' if merge else ''}")


if __name__ == "__main__":
    main()
