"""Headline benchmark: 8K equirect -> 6x2048 cubemap reprojection,
degree-3 b-spline + prefilter (BASELINE.json config #2), on whatever
jax.devices() provides (the driver runs this on one real TPU chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

Measures the steady-state per-chip device pipeline (ray generation +
gates + fused Pallas spline resampling + masking), timed with a chained
device loop so the experimental TPU tunnel's async/dispatch quirks
can't inflate the number. Host/file I/O is excluded, matching the
reference's 'frame rendering time' which times only the in-RAM render
(envutil_payload.cc:476-557).

The reference publishes no numbers (BASELINE.md 'published: {}') and
cannot be built here (no OpenImageIO in the image), so vs_baseline uses
a documented proxy: ~80 Mpix/s for its multithreaded AVX2 degree-3
pipeline on a modern 8-core desktop CPU; the north-star target is 10x
that per chip. Measured bracket: this repo's own XLA-CPU path (same
arithmetic, compiler-vectorized) runs the headline config at 8.9
Mpix/s on this VM's single core (tools/cpu_floor.py, 2026-08-17),
i.e. ~10 Mpix/s/core - consistent with the 80 Mpix/s 8-core proxy.
"""

import json
import math
import sys
import time

import numpy as np

REFERENCE_CPU_MPIX_S = 80.0


def main():
    from envutil_tpu.runtime.platform import ensure_backend

    ensure_backend()
    import jax
    import jax.numpy as jnp

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.render import build_plan

    # --- fixture: 8192x4096 synthetic equirect, RGB float32 ----------
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

    # attach the fast-path variants (seam roll + pitched pole patch),
    # like the loader does for real jobs
    from envutil_tpu.runtime.loader import _attach_variants

    class _A:
        verbose = False
        precise = False
        spline_degree = 3
        prefilter_degree = 3
    _attach_variants(src, fct, _A())
    jax.block_until_ready(src.variants)

    # --- target: 6x2048 cubemap, degree 3, no twining ----------------
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

    # one-jit fused frame: per-pass coordinates restricted to each
    # pass's tile bounding box, planar combine, single finish - the
    # exact program the fast render path runs per frame
    from envutil_tpu.runtime import fastpath as FP
    from envutil_tpu.runtime.fastpath import fused_frame
    import os as _os
    # the planner picks the ladder per frame from the planned tile
    # routing under the gather/DMA/launch cost model - no env knobs
    # (fastpath.select_classes; the headline selects the coarse
    # 8-class ladder, measured 2259.2 vs 2181.5 Mpix/s for the
    # 17-class general ladder, 2026-08-19 A/B on one v5e chip)
    classes = FP.select_classes(plan, src, window, verbose=True)
    frame_fn, state, assigned, passes = fused_frame(plan, src, window,
                                                    classes)
    frac_fast = (assigned >= 0).mean()
    mix = ", ".join(f"{n}/{wc.name}:{(assigned == pi).sum()}"
                    for pi, (n, wc, *_r) in enumerate(passes))
    print(f"# fused tiles: {(assigned >= 0).sum()}/{assigned.size} in "
          f"{len(passes)} passes ({mix})", file=sys.stderr)

    out = jax.block_until_ready(frame_fn(state, jnp.float32(0)))

    runs = 24

    # Both loop variants carry the finished IMAGE through the chained
    # loop: the vanishing carry-dependent coordinate offset defeats
    # loop-invariant hoisting, and the image carry forces the
    # interleaved finish to materialize every frame - a scalar carry
    # (acc + img.ravel()[0]) would let XLA slice the finish
    # transpose/interleave away and time only the planar kernels. The
    # reference's 'frame rendering time' writes the interleaved target
    # array (envutil_payload.cc:476-557) and serve ships
    # frame.tobytes(), so the interleave is production cost.
    if _os.environ.get("ENVUTIL_BENCH_FRESH"):
        # A/B knob: allocate + zero-fill a fresh canvas every frame
        # (the one-shot CLI contract) instead of the steady-state one
        @jax.jit
        def loop(st, im0):
            def body(i, img):
                return frame_fn(st, img.ravel()[0] * 1e-30)
            return jax.lax.fori_loop(0, runs, body, im0).ravel()[0]

        loop_args = (state, out)
    else:
        # steady-state contract (default): carry the canvas through
        # the loop (finish='reuse' skips the per-frame zero-fill,
        # mirroring the reference's preallocated target array that
        # zimt::process rewrites each frame - and our serve/visor
        # paths, which recycle canvases the same way). Measured on one
        # v5e chip: 2181 vs 2120 Mpix/s for the fresh-canvas variant.
        ru_fn, ru_state, _a, _p = fused_frame(plan, src, window,
                                              classes, finish="reuse")
        # (ph, 3*pw) when the in-kernel interleaved finish is
        # admitted (the canvas bytes are then the row-major (H, W, 3)
        # image); planar (3, ph, pw) otherwise
        canvas0 = jnp.zeros(ru_fn.canvas_shape, jnp.float32)
        img0, canvas0 = ru_fn(ru_state, canvas0, jnp.float32(0))
        img0 = jax.block_until_ready(img0)

        @jax.jit
        def loop(st, carry0):
            def body(i, carry):
                img, cv = carry
                return ru_fn(st, cv, img.ravel()[0] * 1e-30)
            return jax.lax.fori_loop(0, runs, body,
                                     carry0)[0].ravel()[0]

        loop_args = (ru_state, (img0, canvas0))

    float(loop(*loop_args))  # compile + warm
    t0 = time.perf_counter()
    float(loop(*loop_args))
    dt = (time.perf_counter() - t0) / runs

    n_px = plan.width * plan.height
    mpix_s = n_px / 1e6 / dt
    rec = {
        "metric": "reprojection Mpix/s/chip (8K equirect->cubemap, "
                  "degree-3 b-spline, fused pallas kernel; "
                  "materialized-finish steady-state contract; "
                  f"{frac_fast:.0%} tiles on fast path)",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REFERENCE_CPU_MPIX_S, 2),
    }
    # measured bracket for this config (VERDICT r3 item 5): the repo's
    # own XLA-CPU rate on THIS config (tools/cpu_floor.py), recorded
    # per config in CPU_FLOORS.json - the proxy's lower edge
    floor = _measured_floor("2")
    if floor is not None:
        rec["cpu_floor_measured"] = floor["value"]
        rec["vs_cpu_floor_1core"] = round(mpix_s / floor["value"], 1)
    print(json.dumps(rec))


def _measured_floor(tag):
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "CPU_FLOORS.json")
    try:
        with open(path) as f:
            return json.load(f).get(tag)
    except (OSError, ValueError):
        return None


if __name__ == "__main__":
    main()
