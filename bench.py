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
that per chip.
"""

import json
import math
import sys
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
    from envutil_tpu.ops import pallas_resample as PR
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.fastpath import _coords, _finish
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
    basis_dev = jnp.asarray(np.asarray(plan.bases[0], np.float32))

    # per-plan static state (one-time, host side): classify tiles for
    # every (variant, window class) like the real fast path
    from envutil_tpu.runtime.fastpath import _variant_names, \
        _variant_spline
    names = _variant_names(src)
    assigned = np.full((plan.height // PR.TILE_H,
                        plan.width // PR.TILE_W), -1, np.int32)
    passes = []
    for name in names:
        sx, sy, m, _z = _coords(plan, window, name, src, 0,
                                (0.0, 0.0), basis_dev)
        spl = _variant_spline(src, name)
        stats = [np.asarray(s) for s in PR.tile_stats(sx, sy)]
        for wc in (PR.LOCAL, PR.DIAG):
            origins, fast = PR.classify_tiles(
                stats, spl.coeff.shape[0], spl.coeff.shape[1], 3, wc)
            take = fast & (assigned < 0)
            if take.any():
                assigned[take] = len(passes)
                org3 = np.concatenate(
                    [origins, take.reshape(-1, 1).astype(np.int32)], 1)
                passes.append((name, wc, jnp.asarray(org3)))
    frac_fast = (assigned >= 0).mean()
    print(f"# fused tiles: {(assigned >= 0).sum()}/{assigned.size} in "
          f"{len(passes)} passes", file=sys.stderr)
    sel_full = jnp.asarray(np.repeat(np.repeat(assigned, PR.TILE_H, 0),
                                     PR.TILE_W, 1))
    coeffs = {n: jnp.moveaxis(_variant_spline(src, n).coeff, -1, 0)
              for n in names}

    def frame(src_, cps, eps):
        combined = None
        for pi, (name, wc, org3) in enumerate(passes):
            sx, sy, m, _z = _coords(plan, window, name, src_, 0,
                                    (0.0, 0.0), basis_dev)
            out = PR.resample_planar(cps[name] + eps, sx, sy, org3,
                                     degree=3, wc=wc)
            img_v = _finish(out, m, 3, 1.0)
            combined = img_v if combined is None else \
                jnp.where((sel_full == pi)[..., None], img_v, combined)
        return combined

    f1 = jax.jit(lambda s, cps: frame(s, cps, jnp.float32(0)))
    out = jax.block_until_ready(f1(src, coeffs))

    runs = 8

    @jax.jit
    def loop(src_, cps):
        def body(i, carry):
            img = frame(src_, cps, carry * 1e-30)
            return carry + img.ravel()[0]
        return jax.lax.fori_loop(0, runs, body, jnp.float32(0))

    float(loop(src, coeffs))  # compile + warm
    t0 = time.perf_counter()
    float(loop(src, coeffs))
    dt = (time.perf_counter() - t0) / runs

    n_px = plan.width * plan.height
    mpix_s = n_px / 1e6 / dt
    print(json.dumps({
        "metric": "reprojection Mpix/s/chip (8K equirect->cubemap, "
                  "degree-3 b-spline, fused pallas kernel; "
                  f"{frac_fast:.0%} tiles on fast path)",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REFERENCE_CPU_MPIX_S, 2),
    }))


if __name__ == "__main__":
    main()
