"""Quantify the default pole approximation on-chip (VERDICT r3 item 6).

Full-spherical sources get approximate 90-degree-pitched copies
('pitched'/'pitched_rolled' variants) so pole-core output tiles become
window-local for the fused kernel; the copy costs one extra resampling
(runtime/loader._attach_variants, mirroring the reference's
stacked-halves over-the-pole treatment, environment.h:326-354).
--precise disables the copies; pole tiles then take the exact XLA
fallback path.

This tool renders a pole-centered view (pitch 90) of a structured
full-spherical source both ways ON THE DEVICE and reports the PSNR of
the default (pitched) render against the --precise (exact) render,
plus the wall-clock of each, so docs/options.md can state the
approximation as a measured number instead of a caveat.

Run (TPU): python tools/pole_error.py [--degree 3] [--size 4096]
"""

import argparse
import math
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--degree", type=int, default=3)
    ap.add_argument("--size", type=int, default=4096)
    args_ns = ap.parse_args()

    from envutil_tpu.runtime.platform import ensure_backend

    ensure_backend()
    import numpy as np

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.runtime import fastpath as FP
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.loader import _attach_variants
    from envutil_tpu.runtime.render import build_plan, render_frame

    w, h = args_ns.size, args_ns.size // 2
    deg = args_ns.degree
    # structured content: smooth gradients + high-frequency checker so
    # the double-resampling loss actually shows
    yy, xx = np.meshgrid(np.linspace(0, 1, h, dtype=np.float32),
                         np.linspace(0, 1, w, dtype=np.float32),
                         indexing="ij")
    checker = ((np.arange(h)[:, None] // 8
                + np.arange(w)[None, :] // 8) % 2).astype(np.float32)
    img = np.stack([xx, yy, 0.5 + 0.5 * checker], axis=-1)
    fct = Facet(facet_no=0, nchannels=3)
    fct.set_geometry(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.step = get_step(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.process_geometry()
    import jax
    src = jax.device_put(E.make_mount_source(fct, img, deg, deg))

    class _A:
        verbose = False
        precise = False
    _A.spline_degree = deg
    _A.prefilter_degree = deg
    _A.coeff_dtype = "f32"
    _attach_variants(src, fct, _A())

    a = Args()
    a.projection = Projection.RECTILINEAR
    a.width, a.height = 1024, 1024
    a.hfov = math.radians(60)
    a.extent = get_extent(a.projection, 1024, 1024, a.hfov)
    a.step = (a.extent.x1 - a.extent.x0) / 1024
    a.pitch = math.radians(90)   # looking straight at the pole
    a.spline_degree = a.prefilter_degree = deg
    a.nchannels = 3
    a.facets = [fct]
    a.solo = 0
    plan = build_plan(a, [fct])

    t0 = time.perf_counter()
    default = render_frame(plan, [src], verbose=True)
    t_default = time.perf_counter() - t0

    # precise: drop the approximate copies (exact variants stay)
    src.variants = {k: v for k, v in src.variants.items()
                    if not k.startswith("pitched")}
    FP._FRAME_CACHE.clear()
    FP._LADDER_CACHE.clear()
    t0 = time.perf_counter()
    precise = render_frame(plan, [src], verbose=True)
    t_precise = time.perf_counter() - t0

    diff = (np.asarray(default, np.float64)
            - np.asarray(precise, np.float64))
    mse = float(np.mean(diff ** 2))
    psnr = 10 * math.log10(1.0 / mse) if mse > 0 else float("inf")
    import json
    print(json.dumps({
        "metric": "default-vs-precise pole render",
        "config": f"{w//1024}K spherical -> 1024^2 rect @ pitch 90, "
                  f"degree {deg}",
        "psnr_db": round(psnr, 1),
        "max_abs": float(np.abs(diff).max()),
        "ms_default": round(t_default * 1e3, 1),
        "ms_precise": round(t_precise * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
