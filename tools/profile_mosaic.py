"""Device-level per-op profile of the headline frame (VERDICT r2
item 4): traces the fused frame with jax.profiler (works through the
axon tunnel), parses the trace.json.gz, and attributes the frame time
to the individual Pallas passes / XLA fusions / DMA on the device
lane. Development tool.

Usage: python tools/profile_mosaic.py [config]
  config: "headline" (default, 8K equirect -> 6x2048 cubemap deg 3)
          "twine16"  (16K bf16 deg-1 -> 2048x1280 rect, auto twine)
          "b6stereo" (biatan6 4K faces -> stereographic 4K)
"""

import glob
import gzip
import json
import math
import os
import sys
import time
from collections import Counter

import numpy as np


def build_headline():
    import jax

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.ops import pallas_resample as PR
    from envutil_tpu.runtime import fastpath as FP
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.loader import _attach_variants
    from envutil_tpu.runtime.render import build_plan

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
    window = (0, plan.height, 0, plan.width)
    classes = (PR.SHEAR6, PR.SHEAR_LOCAL, PR.LOCAL, PR.SHEAR_MINIFY,
               PR.SHEAR_DIAG, PR.MINIFY, PR.STEEP, PR.DIAG)
    frame_fn, state, assigned, passes = FP.fused_frame(
        plan, src, window, classes)
    n_px = plan.width * plan.height
    return frame_fn, state, passes, assigned, n_px


def build_twine16():
    import jax

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.models import stepper as ST
    from envutil_tpu.runtime import fastpath as FP
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.loader import (_apply_coeff_dtype,
                                            _attach_variants)
    from envutil_tpu.runtime.render import build_plan

    w, h = 16384, 8192
    yy, xx = np.meshgrid(np.linspace(0, 1, h, dtype=np.float32),
                         np.linspace(0, 1, w, dtype=np.float32),
                         indexing="ij")
    img = np.stack([xx, yy, (xx * yy)], axis=-1)
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
        coeff_dtype = "bf16"
    _apply_coeff_dtype(src, _A())
    _attach_variants(src, fct, _A())
    _apply_coeff_dtype(src, _A())
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
    frame_fn, state, assigned, passes = FP.fused_frame(
        plan, src, window, spread=spread)
    build_twine16.plan = plan
    build_twine16.src = src
    build_twine16.window = window
    build_twine16.spread = spread
    return frame_fn, state, passes, assigned, 2048 * 1280


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else "headline"
    from envutil_tpu.runtime.platform import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp

    build = {"headline": build_headline, "twine16": build_twine16}[cfg]
    frame_fn, state, passes, assigned, n_px = build()
    mix = ", ".join(
        f"p{pi}={n}/{wc.name}:{(assigned == pi).sum()}t"
        for pi, (n, wc, *_r) in enumerate(passes))
    print(f"# passes: {mix}")

    runs = 8

    @jax.jit
    def loop(st):
        def body(i, carry):
            img = frame_fn(st, carry * 1e-30)
            return carry + img.ravel()[0]
        return jax.lax.fori_loop(0, runs, body, jnp.float32(0))

    float(loop(state))  # compile + warm
    t0 = time.perf_counter()
    float(loop(state))
    dt = (time.perf_counter() - t0) / runs
    print(f"# frame: {dt * 1e3:.2f} ms ({n_px / 1e6 / dt:.1f} Mpix/s)")

    outdir = "/tmp/mosaic_trace"
    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        float(loop(state))

    traces = sorted(glob.glob(outdir + "/plugins/profile/*/"
                              "*.trace.json.gz"))
    d = json.load(gzip.open(traces[-1]))
    ev = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p for p, n in pids.items() if n and "TPU" in n]
    agg = Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev:
            # wrapper ops (the jit entry and the chained frame loop)
            # CONTAIN the real ops - counting them would double the
            # total; leaf ops alone are the device-busy time
            if e["name"].startswith(("jit_", "while")):
                continue
            agg[e["name"]] += e["dur"]
    total = sum(agg.values())
    print(f"# device busy {total / 1e3 / runs:.2f} ms/frame over "
          f"{runs} frames (leaf ops; wrappers excluded); per-op "
          "(>=0.1%):")
    shown = 0
    for name, us in agg.most_common(60):
        ms = us / 1e3 / runs
        pct = 100.0 * us / max(total, 1)
        if pct < 0.1:
            break
        shown += us
        print(f"{ms:9.3f} ms  {pct:5.1f}%  {name}")
    rest = total - shown
    print(f"{rest / 1e3 / runs:9.3f} ms  {100.0 * rest / max(total, 1):5.1f}%  (all ops < 0.1%)")


if __name__ == "__main__":
    main()
