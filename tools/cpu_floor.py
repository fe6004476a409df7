"""Measure the repo's own XLA-CPU multicore rate on the headline
config (8K equirect -> 6x2048 cubemap, degree 3) as a *floor proxy*
for the unbuildable reference binary (BASELINE.md: no OpenImageIO in
this image, so the reference cannot be compiled here).

The XLA-CPU path vectorizes the same arithmetic the reference's SIMD
pipeline runs (coordinates + degree-3 tensor-product evaluation) over
all host cores, so its Mpix/s brackets the reference's from below on
the same machine class; bench.py documents the bracket:

  vs_baseline = tpu_rate / REFERENCE_CPU_MPIX_S   (the ~80 Mpix/s
  modern-desktop estimate), with the measured XLA-CPU floor printed
  alongside for the bracket's lower edge.

Run: ENVUTIL_PLATFORM=cpu python tools/cpu_floor.py
"""

import json
import math
import os
import time

import numpy as np


def main():
    os.environ.setdefault("ENVUTIL_PLATFORM", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.render import _compiled_window, build_plan

    w, h = 8192, 4096
    yy, xx = np.meshgrid(np.linspace(0, 1, h, dtype=np.float32),
                         np.linspace(0, 1, w, dtype=np.float32),
                         indexing="ij")
    img = np.stack([xx, yy, (xx * yy)], axis=-1)
    fct = Facet(facet_no=0, nchannels=3)
    fct.set_geometry(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.step = get_step(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.process_geometry()
    src = E.make_mount_source(fct, img, 3, 3)

    args = Args()
    args.projection = Projection.CUBEMAP
    args.width, args.height = 2048, 6 * 2048
    args.hfov = math.pi / 2
    args.extent = get_extent(args.projection, 2048, 6 * 2048,
                             args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / 2048
    args.spline_degree = args.prefilter_degree = 3
    args.twine = 0
    args.synopsis = "panorama"
    args.nchannels = 3
    args.facets = [fct]
    args.solo = 0
    plan = build_plan(args, [fct])

    # render in 1024-row strips like render_frame's chunking; time
    # steady state after one warmup pass
    windows = [(y, y + 1024, 0, 2048) for y in range(0, 12288, 1024)]
    fns = [_compiled_window(plan, win) for win in windows]
    for fn in fns:
        jax.block_until_ready(fn([src]))
    t0 = time.perf_counter()
    runs = 3
    for _ in range(runs):
        for fn in fns:
            jax.block_until_ready(fn([src]))
    dt = (time.perf_counter() - t0) / runs
    mpix = 2048 * 12288 / 1e6 / dt
    print(json.dumps({
        "metric": "xla_cpu_floor_8k_to_cubemap_deg3",
        "value": round(mpix, 1), "unit": "Mpix/s",
        "ncores": os.cpu_count(),
        "note": "repo's own XLA-CPU multicore rate on the headline "
                "config; lower bracket for the unbuildable reference "
                "binary (see bench.py vs_baseline)"}))


if __name__ == "__main__":
    main()
