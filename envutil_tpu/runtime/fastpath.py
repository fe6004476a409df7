"""Fast single-facet render path: Pallas windowed resampling.

Routes qualifying renders (one facet, no twining, normal lookup) through
the fused Pallas kernel (ops/pallas_resample.py) instead of the XLA
gather path - the difference is ~100x on TPU. The pipeline:

  1. one jitted elementwise pass computes per-pixel spline coordinates
     (stepper + projection + gates) and the validity mask,
  2. one jitted reduction produces per-vreg coordinate statistics,
  3. host-side tile classification picks window origins and flags
     tiles whose support exceeds the static window budget (pole cores,
     seams, extreme rotations),
  4. the Pallas kernel renders everything; a second XLA pass renders
     only the bad tiles' row bands, which overwrite the garbage,
  5. a final elementwise pass applies mask, channel adaptation and
     brighten.

This mirrors the reference's architecture at a different granularity:
the classifier is the analogue of the coarse masking/tiling idea the
reference documents for facet preselection (envutil_payload.cc:744-758),
and the window DMA is the IR 'support makes lookups window-local'
principle (cubemap.h:39-50) applied to every source.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import environment as E
from ..models import stepper as ST
from ..ops import pallas_resample as PR
from ..ops import spline as S


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def eligible(plan, sources) -> bool:
    if len(sources) != 1:
        return False
    src = sources[0]
    if plan.spread is not None:
        return False
    if src.static.kind == "paint" or src.static.masked != -1:
        return False
    if src.spl is None or src.spl.degree > 7:
        return False
    if jax.default_backend() == "cpu":
        return False  # the Mosaic kernel is TPU-only
    return True


@functools.partial(jax.jit, static_argnames=("plan", "window"))
def _coords(plan, window, src):
    """Per-pixel padded spline coordinates + mask for the (padded)
    output raster."""
    ray = ST.target_rays(plan.projection, plan.width, plan.height,
                         plan.extent, basis=plan.bases[0],
                         normalize=True,
                         planar_to_ray=plan.planar_to_ray[0],
                         window=window)
    sx, sy, mask = E.source_spline_coords(src, ray)
    spl = src.spl
    h, w = spl.core_shape
    sx = S.gate(sx, spl.bcs[1], w) + spl.pad
    sy = S.gate(sy, spl.bcs[0], h) + spl.pad
    return sx, sy, mask


@functools.partial(jax.jit, static_argnames=("nch_out", "brighten"))
def _finish(px_planar, mask, nch_out, brighten):
    px = jnp.moveaxis(px_planar, 0, -1)
    px = jnp.where(mask[..., None], px, 0.0)
    px = E.repix(px, nch_out)
    if brighten != 1.0:
        px = E.apply_brighten(px, brighten)
    return px


def render_fast(plan, sources, render_window_fn,
                verbose: bool = False) -> Optional[np.ndarray]:
    """Render via the Pallas path; returns None if not eligible."""
    if not eligible(plan, sources):
        return None
    src = sources[0]

    if plan.crop is not None:
        y0, y1, x0, x1 = plan.crop
    else:
        y0, y1, x0, x1 = 0, plan.height, 0, plan.width
    out_h, out_w = y1 - y0, x1 - x0
    ph = _round_up(out_h, PR.TILE_H)
    pw = _round_up(out_w, PR.TILE_W)
    # padded window: replicate the last row/col of coordinates
    window = (y0, y0 + ph, x0, x0 + pw)
    # (windows may exceed the notional raster; the planar grid formula
    # extrapolates smoothly, which is exactly what we want for padding)

    sx, sy, mask = _coords(plan, window, src)
    stats = PR.tile_stats(sx, sy)
    spl = src.spl
    hp, wp, nch = spl.coeff.shape
    origins, fast = PR.classify_tiles(
        [np.asarray(s) for s in stats], hp, wp, spl.degree, PR.LOCAL)
    n_fast = int(fast.sum())
    if verbose:
        print(f"fastpath: {n_fast}/{fast.size} tiles on the fused "
              f"kernel")
    if n_fast == 0:
        return None

    coeff_planar = jnp.moveaxis(spl.coeff, -1, 0)
    out_planar = PR.resample_planar(coeff_planar, sx, sy,
                                    jnp.asarray(origins),
                                    degree=spl.degree, wc=PR.LOCAL)
    img = _finish(out_planar, mask, plan.nchannels,
                  sources[0].static.brighten)
    img = np.array(jax.device_get(img), np.float32)[:out_h, :out_w]

    # overwrite bad tiles with the exact XLA path, one row band at a
    # time (bands are contiguous runs of tile rows with any bad tile)
    bad_rows = np.where(~fast.all(axis=1))[0]
    if bad_rows.size:
        runs = np.split(bad_rows, np.where(np.diff(bad_rows) > 1)[0] + 1)
        for run in runs:
            ry0 = y0 + int(run[0]) * PR.TILE_H
            ry1 = min(y0 + (int(run[-1]) + 1) * PR.TILE_H, y1)
            band = render_window_fn((ry0, ry1, x0, x1))
            img[ry0 - y0:ry1 - y0] = np.asarray(band, np.float32)
        if verbose:
            n_bad_rows = sum(len(r) for r in runs)
            print(f"fastpath: {n_bad_rows} tile-rows via XLA fallback")
    return img
