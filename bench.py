"""Headline benchmark: 8K equirect -> 6x2048 cubemap reprojection,
degree-3 b-spline + prefilter (BASELINE.json config #2), on whatever
jax.devices() provides (the driver runs this on one real TPU chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md: 'published: {}') and
cannot be built in this image (no OpenImageIO), so vs_baseline uses a
documented proxy: ~80 Mpix/s for the reference's multithreaded
AVX2-SIMD degree-3 pipeline on a modern 8-core desktop CPU - a
deliberately generous estimate of 'frame rendering time' for this
config; the north-star target is 10x that per chip.
"""

import json
import math
import time

import numpy as np

REFERENCE_CPU_MPIX_S = 80.0


def main():
    import jax
    import jax.numpy as jnp

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.render import build_plan, _render_window

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

    src = E.make_mount_source(fct, img, spline_degree=3,
                              prefilter_degree=3)
    src = jax.device_put(src)
    jax.block_until_ready(src.spl.coeff)

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
    fn = jax.jit(lambda s: _render_window(plan, s, window))
    out = jax.block_until_ready(fn([src]))  # compile + warm up

    n_px = plan.width * plan.height
    runs = 10
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn([src])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / runs

    mpix_s = n_px / 1e6 / dt
    print(json.dumps({
        "metric": "reprojection Mpix/s/chip (8K equirect->cubemap, "
                  "degree-3 b-spline)",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REFERENCE_CPU_MPIX_S, 2),
    }))


if __name__ == "__main__":
    main()
