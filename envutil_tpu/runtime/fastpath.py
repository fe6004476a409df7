"""Fast single-facet render path: Pallas windowed resampling with
source-variant routing.

Routes qualifying renders (one facet, no twining, normal lookup)
through the fused Pallas kernel (ops/pallas_resample.py) instead of the
XLA gather path - ~100x on TPU. Pipeline:

  1. a jitted elementwise pass computes per-pixel spline coordinates
     (stepper + projection + gates) and the validity mask - once per
     source *variant*;
  2. a jitted reduction produces per-vreg coordinate statistics;
  3. host-side tile classification assigns each output tile the first
     variant whose window budget it fits:
       * "orig":   the facet's own coefficients,
       * "rolled": seam moved to the image center (exact
         re-parametrization of the periodic axis) - fixes tiles that
         straddle the lon wrap,
       * "pitched"/"pitched_rolled": a 90-degree pitched copy of full
         sphericals (approximate: one extra resampling) - makes pole
         lookups window-local; built once per asset, disabled by
         --precise;
  4. one Pallas pass per used (variant, window-class) pair renders
     exactly its own tiles - a compact 1D grid with scalar-prefetched
     tile coordinates driving the block index maps - writing straight
     into one donated canvas (cheapest class first; the expensive DIAG
     budgets are a global last resort, preferring the pitched copy's
     cheap classes for pole tiles);
  5. tiles no variant can serve are re-rendered one by one through the
     XLA path with a dynamic-origin tile renderer (one compiled
     program, many dispatches);
  6. a single finish applies mask, channel adaptation, and brighten;
     the whole frame is one compiled program, cached on the pass
     structure (rotations and tile origins are traced, so interactive
     serving does not recompile per frame).

This mirrors the reference's own design principles at TPU granularity:
the classifier is its coarse-mask/tiling idea (envutil_payload.cc:
744-758), the window DMA its IR 'support makes lookups window-local'
principle (cubemap.h:39-50), and the pitched copy its stacked-halves
over-the-pole treatment (environment.h:326-354) promoted to a full
re-parametrization.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geo
from ..core.conventions import Projection
from ..core.rotation import rotation_rpy
from ..models import environment as E
from ..models import stepper as ST
from ..ops import pallas_resample as PR
from ..ops import spline as S

# the camera basis used to build pitched copies (see loader): the
# pitched image I' satisfies I'(p') = I(PITCH_BASIS @ ray(p'))
PITCH_BASIS = rotation_rpy(0.0, math.pi / 2, 0.0)

# window classes tried per tile, cheapest first (per-tile kernel cost
# grows with the candidate budgets; DIAG is the global last resort).
# Sheared classes precede the unsheared siblings they shadow: same
# coverage budgets at ~1.5-4x lower gather cost; tiles whose shear
# residual busts the band budget (strong curvature) fall through to
# the unsheared sibling.
DEFAULT_CLASSES = (PR.SHEAR4, PR.SHEAR6, PR.TIGHT, PR.SHEAR_MID,
                   PR.ROWS4, PR.SHEAR6_3, PR.ALIGNED,
                   PR.SHEAR_LOCAL, PR.MID, PR.ROWS6,
                   PR.SHEAR_MINIFY, PR.SHEAR_MINIFY_3,
                   PR.SHEAR_LOCAL_3, PR.LOCAL,
                   PR.SHEAR_DIAG, PR.SHEAR_STEEP, PR.MINIFY,
                   PR.STEEP, PR.DIAG)



def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _same_geom(a, b):
    """Same window geometry ignoring the (degree-rescaled) tap
    budget."""
    return ((a.win_h, a.win_w, a.cand_r, a.cand_c, a.shear_q)
            == (b.win_h, b.win_w, b.cand_r, b.cand_c, b.shear_q))


def _want_unroll(wc):
    """Full row-loop unroll, except for the huge-candidate DIAG
    budgets (code size) and SHEAR4 (historic Mosaic lowering trouble).
    Keyed on budgets, not class identity, so pass-fitted shrunk
    classes (_shrink_passes) inherit the decision of the size they
    actually are."""
    return not (wc.cand_r >= PR.DIAG.cand_r
                or _same_geom(wc, PR.DIAG)
                or _same_geom(wc, PR.SHEAR4))


def eligible(plan, sources, allow_spread: bool = False) -> bool:
    if len(sources) != 1:
        return False
    src = sources[0]
    if plan.spread is not None and not allow_spread:
        return False
    if plan.spread is not None and getattr(plan, "twine_precise",
                                           False):
        # --twine_precise projects the derivative rays onto the
        # pickup's tangent plane IN RAY SPACE (twining.h:152-263);
        # the fused kernels linearize taps in source-coordinate
        # space and never materialize the derivative rays, so the
        # exact semantics run on the XLA graph path
        return False
    if src.static.kind == "paint" or src.static.masked != -1:
        return False
    if src.spl is None or src.spl.degree > 7:
        return False
    if jax.default_backend() == "cpu" and not PR.FORCE_INTERPRET:
        return False  # the Mosaic kernel is TPU-only
    return True


def _variant_names(src) -> List[str]:
    names = ["orig"] + [n for n in ("rolled", "pitched",
                                    "pitched_rolled")
                        if n in src.variants]
    names += [f"sec{i}" for i in range(6)
              if f"sec{i}" in src.variants]
    return names


def _variant_spline(src, name):
    return src.spl if name == "orig" else src.variants[name]


# coarse ladder: fewer, larger classes - half the pallas_call launches
# per frame. Wins on smooth full-frame warps (the headline: 2259 vs
# 2181 Mpix/s, 2026-08-19 A/B on one v5e chip) where the per-pass
# launch overhead outweighs the tighter classes' per-tile savings;
# loses on warped/partial configs where the tight classes' smaller
# windows/budgets dominate. All members are in DEFAULT_CLASSES, so
# per-tile admission exactness is unchanged.
COARSE_CLASSES = (PR.SHEAR6, PR.SHEAR_LOCAL, PR.LOCAL,
                  PR.SHEAR_MINIFY, PR.SHEAR_MINIFY_3, PR.SHEAR_DIAG,
                  PR.SHEAR_STEEP, PR.MINIFY, PR.STEEP, PR.DIAG)

# cost-model constants (one v5e chip): the VPU resolves one (8, 128)
# dynamic_gather per cycle at ~940 MHz; HBM streams ~850 bytes per
# core-cycle. _LAUNCH_CYCLES is NOT a physical launch cost:
# tools/probe_launch.py (2026-08-21) measured chained pallas_calls at
# zero marginal cost (1 vs 8 passes identical, same-class AND
# distinct kernels, small and large canvases). It survives as a
# fragmentation penalty in ladder/consolidation scoring - tiny
# passes buy nothing and cost compile time - and because the 4-vs-8
# pass headline A/B (2026-08-19, 8.44 vs 8.97 ms) showed COARSER
# ladders win on smooth frames for reasons the per-tile gather model
# alone does not capture.
_CYCLES_PER_GATHER = 1.0
_BYTES_PER_CYCLE = 850.0
_LAUNCH_CYCLES = 160_000.0
_XLA_TILE_CYCLES = 3_000_000.0   # an XLA-fallback tile costs ~100x


def _tile_cost_cycles(wc, degree: int, nch: int, itemsize: int,
                      n_taps: int) -> float:
    """Estimated per-tile device cycles for one window class: gather
    chain (the kernel bottleneck - the VPU resolves one (8, 128)
    dynamic_gather per cycle) and window DMA (hidden behind compute
    when the class double-buffers)."""
    n1 = degree + 1
    k = wc.k_taps
    if wc.u_span and n_taps > 1:
        # union-tap: gathers K-independent; per-tap VPU routing term
        if wc.shear_q:
            g = (wc.shear_q * wc.cand_c * wc.cand_r
                 + k * (wc.shear_q * wc.cand_c
                        + (n1 + wc.u_span) * wc.shear_q)) * nch
        else:
            g = k * (wc.cand_r * wc.cand_c
                     + (n1 + wc.u_span) * wc.cand_r) * nch
        if wc.sep:
            # separable grid: horizontal routing + outer product per
            # grid COLUMN (~sqrt(n_taps)); vertical routing unchanged
            kx = max(1, int(round(math.sqrt(n_taps))))
            g += (n_taps * n1 * (wc.u_span + 1)
                  + kx * k * (n1 + wc.u_span))
        else:
            g += n_taps * (n1 * (wc.u_span + 1)
                           + k * (n1 + wc.u_span))
    elif wc.shear_q:
        g = (wc.shear_q * wc.cand_c * wc.cand_r
             + k * (wc.shear_q * wc.cand_c + n1 * wc.shear_q)) * nch
        g *= max(1, n_taps)
    else:
        g = k * wc.cand_r * (wc.cand_c + n1) * nch
        g *= max(1, n_taps)
    compute = PR.NRB * g * _CYCLES_PER_GATHER
    dma = nch * wc.win_h * wc.win_w * itemsize / _BYTES_PER_CYCLE
    if _dbuf_ok_cost(wc, nch, itemsize):
        return max(compute, dma)
    return compute + dma


def _dbuf_ok_cost(wc, nch, itemsize):
    return PR._dbuf_ok(wc, nch, itemsize)


def _plan_cost_cycles(passes, assigned, src, n_taps: int) -> float:
    """Estimated device cycles of a planned frame: per-pass launches,
    per-tile kernel cost, and the XLA patch cost of unassigned tiles."""
    nch = src.spl.coeff.shape[-1]
    itemsize = src.spl.coeff.dtype.itemsize
    cost = float((assigned == -1).sum()) * _XLA_TILE_CYCLES
    for pi, (name, wc, _box, tiles, _merge) in enumerate(passes):
        degree = _variant_spline(src, name).degree
        cost += _LAUNCH_CYCLES + tiles.shape[0] * _tile_cost_cycles(
            wc, degree, nch, itemsize, n_taps)
    return cost


# ladder decisions cached on the frame geometry (selection replans
# once per candidate ladder - device stat reductions - so repeated
# frames of one geometry must not pay it again)
_LADDER_CACHE = {}


def select_classes(plan, src, window, fi: int = 0, spread=None,
                   verbose: bool = False):
    """Pick the class ladder per frame from the planned tile routing:
    plan with both the general 17-class ladder and the coarse 8-class
    ladder, cost both under the gather/DMA/launch model, keep the
    cheaper. Replaces the former ENVUTIL_FINE_LADDER/coarse-bench
    split with a planner decision (VERDICT r2 item 5)."""
    key = (_geom_static(plan), window, fi,
           tuple(spread) if spread is not None else None,
           src.spl.coeff.shape, str(src.spl.coeff.dtype),
           tuple(sorted(src.variants)))
    got = _LADDER_CACHE.get(key)
    if got is not None:
        return got
    n_taps = len(spread) if spread is not None else 0
    best = None
    for classes in (COARSE_CLASSES, DEFAULT_CLASSES):
        passes, assigned = plan_passes(plan, src, window, classes, fi,
                                       spread)
        cost = _plan_cost_cycles(passes, assigned, src, n_taps)
        if verbose:
            print(f"ladder {len(classes)} classes: {len(passes)} "
                  f"passes, est {cost / 940e3:.2f} ms")
        if best is None or cost < best[0]:
            best = (cost, classes)
    _LADDER_CACHE[key] = best[1]
    return best[1]


# geometry interning: plans whose per-facet transform is a plain
# rotation share one compiled program per (geometry, shape) - the
# rotation matrix enters as a traced argument, so interactive serving
# (changing yaw/pitch/roll every frame) does not recompile. Plans with
# generic transform chains (--single lens/translation) stay
# identity-keyed.
_GEOM_CACHE = {}


def _geom_static(plan):
    if any(p is not None for p in plan.planar_to_ray):
        return plan
    key = (plan.projection, plan.width, plan.height, plan.extent,
           plan.nchannels, plan.synopsis, plan.spread, plan.solo,
           plan.crop, len(plan.bases))
    return _GEOM_CACHE.setdefault(key, plan)


@functools.partial(jax.jit,
                   static_argnames=("plan", "window", "name", "fi",
                                    "bias", "dom_neutral"))
def _coords(plan, window, name, src, fi: int = 0, bias=(0.0, 0.0),
            basis=None, dom_neutral: bool = False, fill_mask=None):
    """Per-pixel padded spline coordinates + validity mask + ray z (the
    voronoi centrality criterion) for one source variant of facet
    ``fi``. ``bias`` offsets the sampling grid by a sub-pixel step
    (derivative grids for twining, stepper.h:1587-1715). ``basis`` is
    the traced camera-to-facet rotation (None only when the plan's
    transform chain embeds it).

    ``fill_mask`` (dom_neutral only): use this mask for the coordinate
    fill instead of the grid's own. Derivative grids are filled with
    the CENTER grid's mask so differencing them yields true
    derivatives at every kept pixel - a biased grid's own mask shifts
    at the validity boundary, and mixing a real coordinate with a
    fill there produces margin spikes that bust the class budgets."""
    assert (basis is None) == (plan.planar_to_ray[fi] is not None), \
        "pass the rotation for plain plans, None for generic chains"
    ray = ST.target_rays(plan.projection, plan.width, plan.height,
                         plan.extent, basis=None,
                         normalize=False, bias=bias,
                         planar_to_ray=plan.planar_to_ray[fi],
                         window=window)
    if basis is not None:
        ray = geo.apply_matrix(basis, *ray)
    ray = geo.normalize(*ray)
    ray_z = ray[2]
    if name.startswith("sec"):
        # forced-face section pickup: the whole tile reads one face's
        # extended in-face parametrization (coords stay ungated - an
        # out-of-section footprint must fail classification, not be
        # silently clamped)
        st = src.static
        spl = _variant_spline(src, name)
        m = st.metrics
        face = int(name[3:])
        fx, fy = geo.ray_to_cubeface_fixed(*ray, jnp.int32(face))
        # the "mask" slot carries face DOMINANCE (same ray_to_cubeface
        # the exact path selects with, so bitwise-consistent): the
        # boundary-tile merge passes write exactly the pixels this
        # face dominates (plan_passes boundary phase). Never use it as
        # a validity mask - cubemap sources cover the full sphere.
        fv, _fx2, _fy2 = geo.ray_to_cubeface(*ray)
        mask = fv == face
        fm = mask if fill_mask is None else fill_mask
        if dom_neutral:
            # merge-pass form: pixels this face does not dominate are
            # masked out by the kernel. Pin them to the face edge for
            # finiteness (also absorbs 2-to-1 backward aliasing - a
            # backward ray is never dominated), then replace them with
            # their vreg's dominated-centroid below, so they never
            # constrain the window fit NOR perturb the kernel's
            # per-lane column minima (stats and kernel see the same
            # filled planes).
            fx = jnp.where(fm, fx, jnp.clip(fx, -1.0, 1.0))
            fy = jnp.where(fm, fy, jnp.clip(fy, -1.0, 1.0))
        if st.projection == Projection.BIATAN6:
            fx = (4.0 / math.pi) * jnp.arctan(fx)
            fy = (4.0 / math.pi) * jnp.arctan(fy)
        sx = (fx + m.refc_md) * m.model_to_px - 0.5 + spl.pad
        sy = (fy + m.refc_md) * m.model_to_px - 0.5 + spl.pad
        if dom_neutral:
            sx = PR.masked_coord_fill(sx, fm)
            sy = PR.masked_coord_fill(sy, fm)
        else:
            # whole-tile form (uniform tiles): central projection is
            # 2-to-1 - a ray pointing at the OPPOSITE face aliases to
            # in-window coordinates. Poison backward rays so tiles
            # containing any fail classification (the kernel never
            # runs on them)
            sign = (-1.0, 1.0, -1.0, 1.0, 1.0, -1.0)[face]
            fwd = sign * ray[face >> 1] > 1e-6
            sx = jnp.where(fwd, sx, 2.0e9)
            sy = jnp.where(fwd, sy, 2.0e9)
        return sx, sy, mask, ray_z
    if name.startswith("pitched"):
        ray = geo.apply_matrix(PITCH_BASIS.T, *ray)
    sx, sy, mask = E.source_spline_coords(src, ray)
    spl = _variant_spline(src, name)
    h, w = spl.core_shape
    # mount variants may be oversampled copies (pole patch at 2x):
    # rescale the pixel-center coordinates. Cubemap sources are
    # excluded: their pickup is already in IR pixels, whose core
    # (6 sections incl. support frames) deliberately differs from the
    # facet's nominal face raster
    if src.static.kind != "cubemap":
        rw = w / src.static.total_width
        rh = h / src.static.total_height
        if rw != 1.0:
            sx = (sx + 0.5) * rw - 0.5
        if rh != 1.0:
            sy = (sy + 0.5) * rh - 0.5
    if name.endswith("rolled"):
        sx = sx + w / 2.0
    sx = S.gate(sx, spl.bcs[1], w) + spl.pad
    sy = S.gate(sy, spl.bcs[0], h) + spl.pad
    if dom_neutral:
        # merge-pass form for partial facets: pixels outside the
        # facet's validity window are masked out by the kernel (and
        # zeroed at finish); their planar coordinates blow up near the
        # facet edge (grazing/backward rays) and would otherwise bust
        # every window budget of edge tiles. Replace them with their
        # vreg's valid-pixel linear fit so stats and kernel see the
        # same bounded planes (see plan_passes' boundary phase).
        fm = mask if fill_mask is None else fill_mask
        sx = PR.masked_coord_fill(sx, fm)
        sy = PR.masked_coord_fill(sy, fm)
    return sx, sy, mask, ray_z


@functools.partial(jax.jit, static_argnames=("plan", "window", "fi"))
def _face_map(plan, window, fi, basis):
    """Per-pixel dominant cube face over the window (the same
    ray_to_cubeface the exact path selects with - face choice is
    scale-invariant, so the unnormalized ray suffices)."""
    ray = ST.target_rays(plan.projection, plan.width, plan.height,
                         plan.extent, basis=None, normalize=False,
                         planar_to_ray=plan.planar_to_ray[fi],
                         window=window)
    if basis is not None:
        ray = geo.apply_matrix(basis, *ray)
    fv, _fx, _fy = geo.ray_to_cubeface(*ray)
    return fv


@functools.partial(jax.jit, static_argnames=("plan", "window", "fi"))
def _tap_mask_score(plan, window, src, fi, bias, basis):
    """Validity mask + voronoi score (ray z * recip_step) at a *traced*
    sub-pixel bias of the target grid - the per-tap deflected-ray mask
    the reference's synopsis_t sees (envutil_payload.cc:611-691). One
    compiled program serves every tap position."""
    ray = ST.target_rays(plan.projection, plan.width, plan.height,
                         plan.extent, basis=None, normalize=False,
                         bias=(bias[0], bias[1]),
                         planar_to_ray=plan.planar_to_ray[fi],
                         window=window)
    if basis is not None:
        ray = geo.apply_matrix(basis, *ray)
    ray = geo.normalize(*ray)
    mask = E.get_mask(src, ray)
    score = jnp.where(mask, ray[2] * src.static.recip_step,
                      float(np.finfo(np.float32).min))
    return mask, score


@functools.partial(jax.jit, static_argnames=("geom", "window",
                                              "size"))
def _stability_tiles(geom, window, srcs, bases, size):
    """Per-tile champion stability for the twined multi-facet path:
    a tile is 'stable for facet f' when, over the tile dilated by the
    tap deflection reach (``size`` = (2*ry+1, 2*rx+1)), facet f
    champions every pixel with full validity - there every twining
    tap sees the same synopsis outcome, so the tile reduces to f's
    solo twined frame. Returns ``(stable (F, nty, ntx), reach_any
    (nty, ntx))`` bools; out-of-window neighbourhoods count as
    unstable (zero padding), keeping frame-border tiles in the exact
    per-tap band."""
    ky, kx = size
    ry, rx = ky // 2, kx // 2
    masks, scores = [], []
    for fi in range(len(srcs)):
        _sx, _sy, m, z = _coords(geom, window, "orig", srcs[fi], fi,
                                 (0.0, 0.0), bases[fi])
        masks.append(m)
        scores.append(jnp.where(
            m, z * srcs[fi].static.recip_step,
            float(np.finfo(np.float32).min)))
    champ = jnp.argmax(jnp.stack(scores), axis=0)
    valid_any = jnp.stack(masks).any(axis=0)

    def _window_reduce(a, op, init):
        a = jnp.pad(a, ((ry, ry), (rx, rx)),
                    constant_values=jnp.float32(0.0))
        return jax.lax.reduce_window(a, init, op, (ky, kx), (1, 1),
                                     "VALID")

    def _tiles(a, op):
        h, w = a.shape
        t = a.reshape(h // PR.TILE_H, PR.TILE_H,
                      w // PR.TILE_W, PR.TILE_W)
        return op(op(t, axis=3), axis=1)

    reach = _window_reduce(valid_any.astype(jnp.float32),
                           jax.lax.max, jnp.float32(0.0))
    reach_t = _tiles(reach, jnp.max) > 0.5
    stable = []
    for fi in range(len(srcs)):
        good = ((champ == fi) & valid_any).astype(jnp.float32)
        core = _window_reduce(good, jax.lax.min, jnp.float32(1.0))
        stable.append(_tiles(core, jnp.min) > 0.5)
    return jnp.stack(stable), reach_t


@functools.partial(jax.jit, static_argnames=("nch_out", "brighten"))
def _finish(px_planar, mask, nch_out, brighten):
    px = jnp.moveaxis(px_planar, 0, -1)
    px = jnp.where(mask[..., None], px, 0.0)
    px = E.repix(px, nch_out)
    if brighten != 1.0:
        px = E.apply_brighten(px, brighten)
    return px


@functools.partial(jax.jit, static_argnames=("degree",))
def _eval_tile_xla(coeff, sx, sy, origin, degree):
    """Exact XLA spline evaluation of one (TILE_H, TILE_W) tile at a
    traced origin into the padded coordinate arrays - the generic
    per-tile fallback (one compiled program reused for all bad tiles)."""
    oy, ox = origin
    sxt = jax.lax.dynamic_slice(sx, (oy, ox), (PR.TILE_H, PR.TILE_W))
    syt = jax.lax.dynamic_slice(sy, (oy, ox), (PR.TILE_H, PR.TILE_W))
    spl = S.Spline2D(coeff=coeff, pad=0, degree=degree,
                     bcs=(S.CONSTANT, S.CONSTANT),
                     core_shape=coeff.shape[:2])
    return S.eval_spline(spl, sxt, syt, apply_gate=False)


ZERO_PASS = -2  # tile not covered by the facet: output is zeros


@functools.partial(jax.jit, static_argnames=("degree", "nch_out",
                                             "brighten"))
def _patch_tile(img, coeff, sx, sy, mask, origin, degree, nch_out,
                brighten):
    """Overwrite one (TILE_H, TILE_W) tile of the finished device image
    with the exact XLA evaluation."""
    tile = _eval_tile_xla(coeff, sx, sy, origin, degree)
    oy, ox = origin
    m = jax.lax.dynamic_slice(mask, (oy, ox), (PR.TILE_H, PR.TILE_W))
    tile = _finish(jnp.moveaxis(tile, -1, 0), m, nch_out, brighten)
    return jax.lax.dynamic_update_slice(img, tile, (oy, ox, 0))


@functools.partial(jax.jit, static_argnames=("degree", "nch_out",
                                             "brighten"))
def _patch_tiles_batch(img, coeff, sx, sy, mask, origins, degree,
                       nch_out, brighten):
    """Overwrite all listed (TILE_H, TILE_W) tiles of the finished
    device image with the exact XLA evaluation - one compiled scan
    (one dispatch) instead of a per-tile dispatch loop, which
    dominates through a remote device tunnel. ``origins`` is int32
    (nt, 2)."""
    def body(im, oyx):
        oy, ox = oyx[0], oyx[1]
        tile = _eval_tile_xla(coeff, sx, sy, (oy, ox), degree)
        m = jax.lax.dynamic_slice(mask, (oy, ox),
                                  (PR.TILE_H, PR.TILE_W))
        tile = _finish(jnp.moveaxis(tile, -1, 0), m, nch_out,
                       brighten)
        zero = jnp.zeros((), oy.dtype)  # x64 mode: literals widen
        return jax.lax.dynamic_update_slice(im, tile,
                                            (oy, ox, zero)), 0

    img, _ = jax.lax.scan(body, img, origins)
    return img


def _bad_origins(bad) -> jnp.ndarray:
    return jnp.asarray(
        np.asarray(bad, np.int32) * np.int32((PR.TILE_H, PR.TILE_W)))



def _box_window(window, box):
    """Pixel window of a tile-grid bounding box within ``window``."""
    y0, _y1, x0, _x1 = window
    ty0, ty1, tx0, tx1 = box
    return (y0 + ty0 * PR.TILE_H, y0 + ty1 * PR.TILE_H,
            x0 + tx0 * PR.TILE_W, x0 + tx1 * PR.TILE_W)


# per-face in_face_to_ray as a linear map of (fx, fy, 1)
# (geometry.in_face_to_ray / geometry.h:577-637)
_FACE_P = np.asarray([
    [[0, 0, -1], [0, 1, 0], [1, 0, 0]],    # LEFT
    [[0, 0, 1], [0, 1, 0], [-1, 0, 0]],    # RIGHT
    [[-1, 0, 0], [0, 0, -1], [0, -1, 0]],  # TOP
    [[-1, 0, 0], [0, 0, 1], [0, 1, 0]],    # BOTTOM
    [[1, 0, 0], [0, 1, 0], [0, 0, 1]],     # FRONT
    [[-1, 0, 0], [0, 1, 0], [0, 0, -1]],   # BACK
], np.float32)

_INLINE_TARGETS = (Projection.RECTILINEAR, Projection.CUBEMAP,
                   Projection.BIATAN6, Projection.SPHERICAL,
                   Projection.CYLINDRICAL)


def _gate_bounds(bc, n):
    """(mode, lower, upper) of ops/spline.gate for the inline kernel."""
    if bc == S.PERIODIC:
        return ("periodic", -0.5, n - 0.5)
    if bc == S.REFLECT:
        return ("mirror", -0.5, n - 0.5)
    if bc == S.MIRROR:
        return ("mirror", 0.0, float(n - 1))
    return ("clamp", 0.0, float(n - 1))


@functools.lru_cache(maxsize=64)
def _inline_setup(plan, window, name, core_shape, pad, bcs, statics,
                  twined: bool = False, smode: str = "sph"):
    """Host-side axis-feature arrays + static constants for an
    inline-coordinates pass (PR.resample_inline_into), keyed on the
    static geometry. ``statics`` is the hashable source static tuple
    (total extent/size/window offsets). Returns (tmode, xfeat, yfeat,
    P, consts) with xfeat (Fx, 8, W) and yfeat (Fy, H, 128) float32
    numpy arrays built from the same float64 axes the XLA coordinate
    pass uses. ``twined`` doubles the feature sets with the
    DERIV_BIAS-biased axes (in-kernel derivative grids). ``smode``
    selects the source-side kernel math: "sph" (full-spherical mount)
    or "cubemap"/"biatan6" (IR pickup; ``statics`` is then
    (refc_md, model_to_px, section_px))."""
    y0, y1, x0, x1 = window
    ext = plan.extent

    def axes(bx, by):
        return (ST.planar_axis(plan.width, ext.x0, ext.x1, bx,
                               np.float64, x0, x1),
                ST.planar_axis(plan.height, ext.y0, ext.y1, by,
                               np.float64, y0, y1))

    xs, ys = axes(0.0, 0.0)
    xsb, _ = axes(ST.DERIV_BIAS, 0.0)
    _, ysb = axes(0.0, ST.DERIV_BIAS)

    if plan.projection in (Projection.CUBEMAP, Projection.BIATAN6):
        tmode = "affine"
        section_md = ext.x1 - ext.x0
        refc_md = section_md / 2.0
        rows = np.arange(y0, y1)
        face_of_row = np.clip(rows // plan.width, 0, 5)
        shift = (3.0 - face_of_row) * section_md - refc_md

        def fx(a):
            return (np.tan(a * (math.pi / 4.0))
                    if plan.projection == Projection.BIATAN6 else a)

        xf = [fx(xs)]
        yf = [fx(ys + shift)]
        if twined:
            xf.append(fx(xsb))
            yf.append(fx(ysb + shift))
        P = _FACE_P
    elif plan.projection == Projection.RECTILINEAR:
        tmode = "affine"
        xf = [xs] + ([xsb] if twined else [])
        yf = [ys] + ([ysb] if twined else [])
        P = np.eye(3, dtype=np.float32)[None]
    elif plan.projection == Projection.SPHERICAL:
        tmode = "sph"
        xf = [np.sin(xs), np.cos(xs)]
        yf = [np.sin(ys), np.cos(ys)]
        if twined:
            xf += [np.sin(xsb), np.cos(xsb)]
            yf += [np.sin(ysb), np.cos(ysb)]
        P = np.eye(3, dtype=np.float32)[None]
    else:  # CYLINDRICAL
        tmode = "cyl"
        xf = [np.sin(xs), np.cos(xs)]
        yf = [ys]
        if twined:
            xf += [np.sin(xsb), np.cos(xsb)]
            yf += [ysb]
        P = np.eye(3, dtype=np.float32)[None]

    xfeat = np.broadcast_to(
        np.stack([a.astype(np.float32) for a in xf])[:, None, :],
        (len(xf), 8, xs.size)).copy()
    yfeat = np.broadcast_to(
        np.stack([a.astype(np.float32) for a in yf])[:, :, None],
        (len(yf), ys.size, 128)).copy()

    if smode in ("cubemap", "biatan6"):
        # IR pickup (metrics.get_pickup_coordinate_px): scale fx/fy by
        # model_to_px around the section center; the per-face section
        # offset rides as consts[11] (face selected in-kernel)
        refc_md, model_to_px, section_px = statics
        k = float(model_to_px)
        c = float(refc_md * model_to_px - 0.5)
        consts = (k, c, k, c, "none", 0.0, 0.0, "none", 0.0, 0.0,
                  float(pad), float(section_px))
        return tmode, xfeat, yfeat, P, consts

    # model -> spline affine (environment._md_to_spline) composed with
    # the variant rescale (oversampled pitched copies) and the rolled
    # half-width shift, exactly as _coords applies them in sequence
    (tex0, tex1, tey0, tey1, tw, th, wxo, wyo) = statics
    h, w = core_shape
    kxm = tw / (tex1 - tex0)
    kym = th / (tey1 - tey0)
    cx0 = -tex0 * kxm - 0.5 - wxo
    cy0 = -tey0 * kym - 0.5 - wyo
    rw = w / tw
    rh = h / th
    kx, cx = kxm * rw, (cx0 + 0.5) * rw - 0.5
    ky, cy = kym * rh, (cy0 + 0.5) * rh - 0.5
    if name.endswith("rolled"):
        cx += w / 2.0
    gate_x, glx, gux = _gate_bounds(bcs[1], w)
    gate_y, gly, guy = _gate_bounds(bcs[0], h)
    consts = (float(kx), float(cx), float(ky), float(cy),
              gate_x, float(glx), float(gux),
              gate_y, float(gly), float(guy), float(pad))
    return tmode, xfeat, yfeat, P, consts


def _inline_eligible(plan, src, fi, name, spread, merge):
    """Can this pass run with the coordinate chain fused in-kernel?
    Returns the source-side kernel mode ("sph" for full-spherical
    mounts, "cubemap"/"biatan6" for IR pickups) or None."""
    if (merge or plan.planar_to_ray[fi] is not None
            or plan.projection not in _INLINE_TARGETS
            or name.startswith("sec")):
        return None
    if (src.static.kind == "mount"
            and src.static.projection == Projection.SPHERICAL
            and src.spl is not None and src.spl.spherical):
        return "sph"
    if src.static.kind == "cubemap" and name == "orig" \
            and src.spl is not None:
        return ("biatan6" if src.static.projection == Projection.BIATAN6
                else "cubemap")
    return None


def _consolidate_passes(passes, skeys, assigned, src, stats_cache,
                        n_taps):
    """Launch-count consolidation: a pallas_call launch inside one jit
    costs ~0.13 ms (_LAUNCH_CYCLES), so a small pass is often worth
    folding into another pass's (usually costlier) window class.
    Greedy: apply the best net-positive merge until none remains.

    A merge (i -> j) moves ALL of pass i's tiles into pass j's class.
    Feasible when both passes render the same variant with the same
    merge semantics, one pass's stat box contains the other's (within
    a planning phase boxes are bounding boxes of a shrinking tile set,
    hence nested), and every tile of BOTH passes classifies fast under
    j's class - per-tile statistics are box-independent (the
    coordinate field of a tile does not depend on which box it was
    computed over), so the containing box's cached stats decide
    exactly. The merged pass re-derives window origins and row-block
    extensions from those stats, so it is exactly the pass the planner
    would have built had it assigned these tiles to j's class in the
    first place. Coordinate compute never grows: the merged pass uses
    the containing box, which an existing pass already paid for, and
    one box disappears."""
    nch = src.spl.coeff.shape[-1]
    itemsize = src.spl.coeff.dtype.itemsize
    passes = list(passes)
    skeys = list(skeys)

    def contains(a, b):
        return (a[0] <= b[0] and a[1] >= b[1]
                and a[2] <= b[2] and a[3] >= b[3])

    def tile_cost(name, wc):
        spl = _variant_spline(src, name)
        return _tile_cost_cycles(wc, spl.degree, nch, itemsize, n_taps)

    while len(passes) > 1:
        best = None
        for i, (ni, wci, boxi, ti, mi) in enumerate(passes):
            ci = tile_cost(ni, wci)
            for j, (nj, wcj, boxj, tj, mj) in enumerate(passes):
                if i == j or ni != nj or mi != mj:
                    continue
                if contains(boxi, boxj):
                    box, skey = boxi, skeys[i]
                elif contains(boxj, boxi):
                    box, skey = boxj, skeys[j]
                else:
                    continue
                gain = _LAUNCH_CYCLES - ti.shape[0] * (tile_cost(nj, wcj)
                                                       - ci)
                if gain <= 0 or (best is not None and gain <= best[0]):
                    continue
                stats = stats_cache.get(skey)
                if stats is None:
                    continue
                spl = _variant_spline(src, nj)
                try:
                    _org, fast = PR.classify_tiles(
                        stats, spl.coeff.shape[0], spl.coeff.shape[1],
                        spl.degree, wcj)
                except AssertionError:
                    continue   # stats lack the fit/range entries
                bntx = box[3] - box[2]
                out = np.concatenate([ti[:, 2:4], tj[:, 2:4]])
                iby = out[:, 0] - box[0]
                ibx = out[:, 1] - box[2]
                if not fast[iby, ibx].all():
                    continue
                best = (gain, i, j, box, skey)
        if best is None:
            break
        _gain, i, j, box, skey = best
        name, wcj = passes[j][0], passes[j][1]
        merge_flag = passes[j][4]
        spl = _variant_spline(src, name)
        stats = stats_cache[skey]
        origins, _fast = PR.classify_tiles(
            stats, spl.coeff.shape[0], spl.coeff.shape[1],
            spl.degree, wcj)
        bntx = box[3] - box[2]
        out = np.concatenate([passes[i][3][:, 2:4],
                              passes[j][3][:, 2:4]])
        iby = out[:, 0] - box[0]
        ibx = out[:, 1] - box[2]
        org = origins[iby * bntx + ibx]
        tiles = np.column_stack(
            [iby, ibx, out[:, 0], out[:, 1],
             org[:, 0], org[:, 1]]).astype(np.int32)
        if wcj.shear_q:
            ext = PR.row_block_shear(stats, tiles, spl.degree, wcj)
        else:
            ext = PR.row_block_origins(stats, tiles, spl.degree, wcj)
        tiles = np.concatenate([tiles, ext], axis=1)
        keep = [k for k in range(len(passes)) if k not in (i, j)]
        remap = np.full(len(passes), -1, np.int32)
        for new, old in enumerate(keep):
            remap[old] = new
        remap[i] = remap[j] = len(keep)
        sel = assigned >= 0
        assigned = assigned.copy()
        assigned[sel] = remap[assigned[sel]]
        passes = [passes[k] for k in keep] \
            + [(name, wcj, box, tiles, merge_flag)]
        skeys = [skeys[k] for k in keep] + [skey]
    return passes, assigned, skeys


def _sep_scale(spl, cmy: float) -> float:
    """Scaling for tile_stats_fit_range's dvx stat: the sep classes'
    admission bounds the DROPPED x-deflection ``cmax_y * |dvx|`` at 4
    ulps of the coefficient-table width (the float-noise magnitude of
    an analytically-zero dvx through the coordinate pass)."""
    wp = spl.coeff.shape[1]
    return float(cmy) / (4.0 * wp * 2.0 ** -23 + 1e-30)


def _spread_grid(spread):
    """(cxs, cys, w_row_major) when the bias-folded spread enumerates
    a full tensor grid (make_spread's box and untruncated gaussian
    kernels do; thresholded gaussians lose corner taps and return
    None). Weights stay per-tap - only the POSITIONS must factor, so
    the separable routing is exact for any weight profile."""
    cxs = sorted({t[0] for t in spread})
    cys = sorted({t[1] for t in spread})
    if len(cxs) * len(cys) != len(spread) or len(spread) < 4:
        return None
    w = {}
    for cx, cy, wt in spread:
        if (cx, cy) in w:
            return None
        w[(cx, cy)] = wt
    if len(w) != len(spread):
        return None
    return (tuple(cxs), tuple(cys),
            tuple(w[(cx, cy)] for cy in cys for cx in cxs))


def _rebuild_tile_rows(stats, tyx, box, origins, degree, wc):
    """Compact tile rows (incl. the extended per-row-block columns)
    for the given out-tile coordinates under window class ``wc``.
    ``tyx`` is int (nt, 2) out_by/out_bx; ``origins`` is the flat
    classify_tiles result over ``box``."""
    bty0, _bty1, btx0, btx1 = box
    bntx = btx1 - btx0
    iby = tyx[:, 0] - bty0
    ibx = tyx[:, 1] - btx0
    org = origins[iby * bntx + ibx]
    tiles = np.column_stack(
        [iby, ibx, tyx[:, 0], tyx[:, 1],
         org[:, 0], org[:, 1]]).astype(np.int32)
    if wc.shear_q:
        ext = PR.row_block_shear(stats, tiles, degree, wc)
    else:
        ext = PR.row_block_origins(stats, tiles, degree, wc)
    return np.concatenate([tiles, ext], axis=1)


def _fitted_class(wc, stats, tiles, degree):
    """Shrink ``wc``'s static budgets to what these tiles' measured
    per-vreg statistics actually need - the same admission formulas
    classify_tiles applies, evaluated at equality. Per-tile cost is
    roughly linear in cand_r*cand_c + k_taps*(n1+u_span) gathers and
    the window DMA bytes, while the class ladder's budgets are sized
    for the worst admitted tile - a smooth minified frame typically
    needs half of each. Every shrunk field keeps the original class's
    admission criteria satisfied (verified by re-classification in
    _shrink_passes), so values are unchanged; only dead candidate
    blocks, dead tap columns and dead window area disappear."""
    NV = TILE_H_VREGS
    vr = (tiles[:, 0:1] * NV + np.arange(NV)[None, :])
    vc = tiles[:, 1:2]
    min_y, max_y, min_x, max_x, drift = [np.asarray(s)[vr, vc]
                                         for s in stats[:5]]
    off = degree // 2
    k_need = int(np.floor(drift).max()) + degree + 2
    span_y = (np.floor(max_y)
              - ((np.floor(min_y).astype(np.int64) - off) // 8) * 8
              - off + degree)
    span_x = (np.floor(max_x)
              - ((np.floor(min_x).astype(np.int64) - off) // 128) * 128
              - off + degree)
    cand_r = int(span_y.max() + degree) // 8 + 1
    cand_c = int(span_x.max()) // 128 + 1
    # per-tile window span (worst-case 8/128 alignment of the origin)
    t_lo_y = np.floor(min_y.min(axis=1)).astype(np.int64) - off
    t_hi_y = np.floor(max_y.max(axis=1)).astype(np.int64) - off + degree
    t_lo_x = np.floor(min_x.min(axis=1)).astype(np.int64) - off
    t_hi_x = np.floor(max_x.max(axis=1)).astype(np.int64) - off + degree
    win_h = int((t_hi_y - (t_lo_y // 8) * 8).max()) + 1
    win_w = int((t_hi_x - (t_lo_x // 128) * 128).max()) + 1
    q = 0
    if wc.shear_q:
        rlo = np.asarray(stats[7])[vr, vc]
        rhi = np.asarray(stats[8])[vr, vc]
        q = (int((rhi - rlo).max()) + degree + 3 + 7) // 8
    u = 0
    if wc.u_span:
        u = max(1, int(np.asarray(stats[9])[vr, vc].max()))
    cand_r = max(1, min(cand_r, wc.cand_r))
    cand_c = max(1, min(cand_c, wc.cand_c))
    win_h = min(max(_round_up(win_h, 8), 8 * cand_r), wc.win_h)
    win_w = min(max(_round_up(win_w, 128), 128 * cand_c), wc.win_w)
    return dataclasses.replace(
        wc, win_h=win_h, win_w=win_w, cand_r=cand_r, cand_c=cand_c,
        k_taps=max(degree + 2, min(k_need, wc.k_taps)),
        shear_q=max(1, min(q, wc.shear_q)) if wc.shear_q else 0,
        u_span=min(u, wc.u_span) if wc.u_span else 0)


def _shrink_passes(passes, skeys, assigned, src, stats_cache,
                   n_taps: int = 0):
    """Post-planning class fitting: replace each pass's window class
    with the fitted shrink of _fitted_class, re-classify under it (the
    authoritative admission check - origin clipping near array edges
    can interact with the smaller window), and rebuild the tile rows.
    Passes whose tiles no longer all classify keep the original class
    (never happens for interior tiles; cheap insurance near edges).

    Additionally SPLITS a pass into fitted-cost buckets when the cost
    model says the bucket savings beat the extra pallas_call launch:
    a frame's worst tile (a pole/corner) otherwise dictates the whole
    pass's candidate budgets - e.g. a minified frame's corner tiles
    need cand_r ~2x the interior's. The inverse of
    _consolidate_passes, priced by the same constants."""
    nch = src.spl.coeff.shape[-1]
    itemsize = src.spl.coeff.dtype.itemsize
    out = []
    assigned = assigned.copy()
    # merge tiles appear in several passes; keep the pre-shrink
    # convention that `assigned` records the FIRST owning pass
    claimed = np.zeros(assigned.shape, bool)

    def emit(name, wc, box, tiles, merge, stats, spl):
        fit = _fitted_class(wc, stats, tiles, spl.degree)
        if fit != wc:
            origins, fast = PR.classify_tiles(
                stats, spl.coeff.shape[0], spl.coeff.shape[1],
                spl.degree, fit)
            iby = tiles[:, 2] - box[0]
            ibx = tiles[:, 3] - box[2]
            if not fast[iby, ibx].all():
                fit = wc
            else:
                tiles = _rebuild_tile_rows(stats, tiles[:, 2:4], box,
                                           origins, spl.degree, fit)
        t_y, t_x = tiles[:, 2], tiles[:, 3]
        fresh = ~claimed[t_y, t_x]
        assigned[t_y[fresh], t_x[fresh]] = len(out)
        claimed[t_y, t_x] = True
        out.append((name, fit, box, tiles, merge))

    for (name, wc, box, tiles, merge), skey in zip(passes, skeys):
        stats = stats_cache.get(skey)
        if stats is None or tiles.shape[0] == 0:
            out.append((name, wc, box, tiles, merge))
            continue
        spl = _variant_spline(src, name)
        nt = tiles.shape[0]
        if nt < 6:
            emit(name, wc, box, tiles, merge, stats, spl)
            continue
        # cost-bucket split: order tiles by their own fitted cost and
        # try quartile cuts; accept the best net-positive split
        fit_all = _fitted_class(wc, stats, tiles, spl.degree)
        cost_all = nt * _tile_cost_cycles(fit_all, spl.degree, nch,
                                          itemsize, n_taps)
        per = np.asarray([
            _tile_cost_cycles(
                _fitted_class(wc, stats, tiles[i:i + 1], spl.degree),
                spl.degree, nch, itemsize, n_taps)
            for i in range(nt)])
        order = np.argsort(per)
        best = None
        for frac in (0.25, 0.5, 0.75):
            cut = int(nt * frac)
            if cut == 0 or cut == nt:
                continue
            a = tiles[order[:cut]]
            b = tiles[order[cut:]]
            fa = _fitted_class(wc, stats, a, spl.degree)
            fb = _fitted_class(wc, stats, b, spl.degree)
            cost = (_LAUNCH_CYCLES
                    + cut * _tile_cost_cycles(fa, spl.degree, nch,
                                              itemsize, n_taps)
                    + (nt - cut) * _tile_cost_cycles(
                        fb, spl.degree, nch, itemsize, n_taps))
            if cost < cost_all and (best is None or cost < best[0]):
                best = (cost, cut)
        if best is None:
            emit(name, wc, box, tiles, merge, stats, spl)
            continue
        _c, cut = best
        emit(name, wc, box, tiles[np.sort(order[:cut])], merge,
             stats, spl)
        emit(name, wc, box, tiles[np.sort(order[cut:])], merge,
             stats, spl)
    return out, assigned


TILE_H_VREGS = PR.TILE_H // 8


def plan_passes(plan, src, window, classes, fi: int = 0, spread=None,
                masked_merge: bool = True, exclude=None,
                want_union: bool = True, no_sep: bool = False):
    """Host-side pass planner: each (window class, variant) pair is
    only evaluated over the tile bounding box of the still-unassigned
    tiles, so the expensive coordinate passes for seam/pole variants
    never touch the whole frame.

    ``spread`` (bias-folded (cx, cy, w) taps) switches to twined
    classification: budgets are checked against the full tap footprint
    (tile_stats_range over the derivative margins).

    Returns ``(passes, assigned)`` with passes a list of
    ``(name, wc, box, tiles, merge)``: variant name, window class,
    tile-grid bounding box (ty0, ty1, tx0, tx1) the coordinates are
    computed over, int32 (nt, 6) compact tile rows (in_by, in_bx,
    out_by, out_bx, oy, ox) for resample_planar_into - one row per
    tile the pass owns - and the merge flag (face-boundary overlay
    passes: the kernel writes only the pixels the pass's face
    dominates, see the boundary phase below).

    ``exclude`` (bool (nty, ntx)) reserves tiles for the caller: they
    are never assigned to a pass (nor to ZERO_PASS) and come back as
    -1, to be patched with caller-specific semantics (e.g. the
    per-tap-masked facet-edge band of a partial twined render)."""
    geom = _geom_static(plan)
    basis = _basis_arg(plan, fi)
    names = _variant_names(src)
    y0, y1, x0, x1 = window
    nty, ntx = (y1 - y0) // PR.TILE_H, (x1 - x0) // PR.TILE_W
    assigned = np.full((nty, ntx), -1, np.int32)

    # coverage (ZERO_PASS) from the facet's own parametrization
    _sx0, _sy0, mask, _z0 = _coords(geom, window, "orig", src, fi,
                                    (0.0, 0.0), basis)
    covered = np.asarray(mask).reshape(
        nty, PR.TILE_H, ntx, PR.TILE_W).any(axis=(1, 3))
    assigned[~covered] = ZERO_PASS
    excl = (np.zeros((nty, ntx), bool) if exclude is None
            else np.asarray(exclude, bool))
    assigned[excl] = -1  # reserved for the caller, even if uncovered

    # cubemap face dominance: sec{i} may claim a whole tile outright
    # only when face i dominates every pixel (forcing a boundary
    # tile through ONE face approximates its minority pixels - they
    # read re-projected support content); mixed tiles are handled
    # exactly by the boundary phase below (one merge pass per
    # contributing face)
    has_sec = any(n.startswith("sec") for n in names)
    tile_face = None
    if has_sec:
        fmap = np.asarray(_face_map(geom, window, fi, basis))
        tf = fmap.reshape(nty, PR.TILE_H, ntx, PR.TILE_W)
        uniform = (tf == tf[:, :1, :, :1]).all(axis=(1, 3))
        tile_face = np.where(uniform, tf[:, 0, :, 0], -1)

    # pass priority: cheapest window class first across the exact
    # variants (orig/rolled are exact re-parametrizations), then the
    # approximate pitched copies, and the expensive DIAG budgets as a
    # global last resort - a DIAG tile costs ~4x a LOCAL tile, so a
    # pole tile the pitched copy serves at a cheap class should never
    # burn a DIAG pass on the original parametrization
    exact = [n for n in names
             if not n.startswith(("pitched", "sec"))]
    approx = [n for n in names if n.startswith(("pitched", "sec"))]
    # the class tap budgets are sized for degree 3 (k = drift budget
    # + 3 + 2); for other degrees, try a degree-shifted variant of
    # each class first (same drift budget, fewer/more tap columns -
    # bilinear saves 2 wasted columns per pixel, degree>3 gains the
    # columns it needs), keeping the original as the fallback for
    # tiles that need the extra drift slack
    degree = src.spl.degree if src.spl is not None else 3
    if degree != 3:
        shifted = []
        for wc in classes:
            k = max(wc.k_taps + degree - 3, degree + 2)
            if k != wc.k_taps:
                shifted.append(dataclasses.replace(wc, k_taps=k))
            shifted.append(wc)
        classes = tuple(shifted)
    grid = _spread_grid(spread) if spread is not None else None
    if spread is not None and len(spread) > 1 and want_union:
        # union-tap variants first: same geometry plus the per-pixel
        # row-footprint budget; admitted tiles pay the gather chain
        # once for all K taps instead of K times. Tiles that bust the
        # row-span budget (strong minification margins) keep the
        # per-tap original. Pertap frames pass want_union=False: their
        # kernels run single-tap, where a u-variant only splits tiles
        # into an extra pallas_call for identical work. When the
        # spread is a tensor grid, the separable (sep) variant of each
        # u-class goes first: strictly cheaper routing, admitted only
        # on dvx == 0 tiles (stat 10).
        uni = []

        def u_variants(wc, u):
            if grid is not None and not no_sep:
                uni.append(dataclasses.replace(wc, u_span=u,
                                               sep=True))
            uni.append(dataclasses.replace(wc, u_span=u))

        for wc in classes:
            u_variants(wc, 2)
            if wc.cand_r >= 8:
                # roomy-window classes also try a deeper span before
                # giving up (heavy twining: 16-tap minified configs)
                u_variants(wc, 6)
            uni.append(wc)
        classes = tuple(uni)
    _last_resort = (PR.SHEAR_DIAG, PR.SHEAR_STEEP, PR.STEEP, PR.DIAG)
    cheap = [wc for wc in classes
             if not any(_same_geom(wc, l) for l in _last_resort)]
    last = [wc for wc in classes
            if any(_same_geom(wc, l) for l in _last_resort)]
    order = ([(wc, n) for wc in cheap for n in exact]
             + [(wc, n) for wc in cheap for n in approx]
             + [(wc, n) for wc in last for n in names])

    passes = []
    skeys = []   # per-pass stats_cache key (for _consolidate_passes)
    stats_cache = {}

    def _dom_stats(name, box):
        """Classifier statistics over ``box`` computed on dom_neutral
        coordinates: pixels the pass will not write (other-face or
        out-of-facet) are filled with their vreg's valid-pixel linear
        fit, so only written pixels constrain the budgets."""
        key = (name, box, "dom")
        if key not in stats_cache:
            spl = _variant_spline(src, name)
            bwin = _box_window(window, box)
            if spread is None:
                sx, sy, _m, _z = _coords(geom, bwin, name, src, fi,
                                         (0.0, 0.0), basis,
                                         dom_neutral=True)
                raw = PR.tile_stats_fit(sx, sy, spl.degree)
            else:
                c0 = _coords(geom, bwin, name, src, fi, (0.0, 0.0),
                             basis, dom_neutral=True)
                c10 = _coords(geom, bwin, name, src, fi,
                              (ST.DERIV_BIAS, 0.0), basis,
                              dom_neutral=True, fill_mask=c0[2])
                c01 = _coords(geom, bwin, name, src, fi,
                              (0.0, ST.DERIV_BIAS), basis,
                              dom_neutral=True, fill_mask=c0[2])
                dux, dvx = _deriv(c0[0], c10[0], c01[0])
                duy, dvy = _deriv(c0[1], c10[1], c01[1])
                cmx = max(abs(c[0]) for c in spread)
                cmy = max(abs(c[1]) for c in spread)
                mx = cmx * jnp.abs(dux) + cmy * jnp.abs(dvx)
                my = cmx * jnp.abs(duy) + cmy * jnp.abs(dvy)
                raw = PR.tile_stats_fit_range(
                    c0[0], c0[1], mx, my, spl.degree,
                    dvx=dvx * _sep_scale(spl, cmy))
            stats_cache[key] = [np.asarray(s) for s in raw]
        return stats_cache[key]

    for wc, name in order:
        rem = (assigned == -1) & ~excl
        if not rem.any():
            break
        ys, xs = np.nonzero(rem)
        box = (int(ys.min()), int(ys.max()) + 1,
               int(xs.min()), int(xs.max()) + 1)
        spl = _variant_spline(src, name)
        if (name, box) not in stats_cache:
            bwin = _box_window(window, box)
            if spread is None:
                sx, sy, _m, _z = _coords(geom, bwin, name, src, fi,
                                         (0.0, 0.0), basis)
                raw = PR.tile_stats_fit(sx, sy, spl.degree)
            else:
                c0 = _coords(geom, bwin, name, src, fi, (0.0, 0.0),
                             basis)
                c10 = _coords(geom, bwin, name, src, fi,
                              (ST.DERIV_BIAS, 0.0), basis)
                c01 = _coords(geom, bwin, name, src, fi,
                              (0.0, ST.DERIV_BIAS), basis)
                dux, dvx = _deriv(c0[0], c10[0], c01[0])
                duy, dvy = _deriv(c0[1], c10[1], c01[1])
                cmx = max(abs(c[0]) for c in spread)
                cmy = max(abs(c[1]) for c in spread)
                mx = cmx * jnp.abs(dux) + cmy * jnp.abs(dvx)
                my = cmx * jnp.abs(duy) + cmy * jnp.abs(dvy)
                raw = PR.tile_stats_fit_range(
                    c0[0], c0[1], mx, my, spl.degree,
                    dvx=dvx * _sep_scale(spl, cmy))
            stats_cache[name, box] = [np.asarray(s) for s in raw]
        stats = stats_cache[name, box]
        bty0, bty1, btx0, btx1 = box
        bntx = btx1 - btx0
        origins, fast = PR.classify_tiles(
            stats, spl.coeff.shape[0], spl.coeff.shape[1],
            spl.degree, wc)
        take = fast & rem[bty0:bty1, btx0:btx1]
        if name.startswith("sec"):
            take &= (tile_face[bty0:bty1, btx0:btx1]
                     == int(name[3:]))
        if take.any():
            assigned[bty0:bty1, btx0:btx1][take] = len(passes)
            iby, ibx = np.nonzero(take)
            org = origins[iby * bntx + ibx]
            tiles = np.column_stack(
                [iby, ibx, iby + bty0, ibx + btx0,
                 org[:, 0], org[:, 1]]).astype(np.int32)
            # extended rows: per-row-block candidate origins, so the
            # kernel skips its serializing cross-lane reductions
            # (sheared classes add the fixed-point shear line)
            if wc.shear_q:
                ext = PR.row_block_shear(stats, tiles, spl.degree, wc)
            else:
                ext = PR.row_block_origins(stats, tiles, spl.degree,
                                           wc)
            tiles = np.concatenate([tiles, ext], axis=1)
            passes.append((name, wc, box, tiles, False))
            skeys.append((name, box))

    # boundary phase: a face-boundary tile mixes dominant faces, so no
    # single sec pass can serve it exactly. Render it once per
    # contributing face through that face's extended section
    # parametrization, each a MERGE pass writing only the pixels its
    # face dominates (majority-pixel evaluation through the section
    # slice is exact - it reads the same IR coefficients at the same
    # coordinates as the full-IR evaluation), so the composite equals
    # the exact XLA render. A tile joins only if EVERY face present in
    # it classifies; otherwise it stays -1 (XLA fallback).
    rem = (assigned == -1) & ~excl
    if has_sec and rem.any():
        ys, xs = np.nonzero(rem)
        box = (int(ys.min()), int(ys.max()) + 1,
               int(xs.min()), int(xs.max()) + 1)
        bty0, bty1, btx0, btx1 = box
        bntx = btx1 - btx0
        ladder = cheap + last
        cls_cache = {}

        def face_fit(f):
            """First-fitting class per box tile for sec{f}, or None."""
            name = f"sec{f}"
            if name not in names:
                return None
            if f not in cls_cache:
                spl = _variant_spline(src, name)
                stats = _dom_stats(name, box)
                per_class = []
                for wc in ladder:
                    origins, fast = PR.classify_tiles(
                        stats, spl.coeff.shape[0],
                        spl.coeff.shape[1], spl.degree, wc)
                    per_class.append((wc, origins, fast))
                # first (cheapest) fitting class per tile
                pick = np.full(per_class[0][2].shape, -1, np.int32)
                for ci, (_wc, _o, fast) in enumerate(per_class):
                    pick[(pick == -1) & fast] = ci
                cls_cache[f] = (per_class, pick)
            return cls_cache[f]

        # per-tile face sets and fits
        groups = {}  # (face, class index) -> list of tile rows
        for ty, tx in zip(ys, xs):
            faces = np.unique(tf[ty, :, tx, :])
            fits = []
            for f in faces:
                got = face_fit(int(f))
                if got is None:
                    fits = None
                    break
                per_class, pick = got
                ci = pick[ty - bty0, tx - btx0]
                if ci < 0:
                    fits = None
                    break
                fits.append((int(f), int(ci)))
            if fits is None:
                continue
            assigned[ty, tx] = -3  # mergeable; patched to a pass below
            for f, ci in fits:
                groups.setdefault((f, ci), []).append((ty, tx))

        for (f, ci), tlist in sorted(groups.items()):
            name = f"sec{f}"
            spl = _variant_spline(src, name)
            per_class, _pick = cls_cache[f]
            wc, origins, _fast = per_class[ci]
            stats = stats_cache[name, box, "dom"]
            iby = np.asarray([ty - bty0 for ty, tx in tlist])
            ibx = np.asarray([tx - btx0 for ty, tx in tlist])
            org = origins[iby * bntx + ibx]
            tiles = np.column_stack(
                [iby, ibx, iby + bty0, ibx + btx0,
                 org[:, 0], org[:, 1]]).astype(np.int32)
            if wc.shear_q:
                ext = PR.row_block_shear(stats, tiles, spl.degree, wc)
            else:
                ext = PR.row_block_origins(stats, tiles, spl.degree,
                                           wc)
            tiles = np.concatenate([tiles, ext], axis=1)
            for ty, tx in tlist:
                if assigned[ty, tx] == -3:
                    assigned[ty, tx] = len(passes)
            passes.append((name, wc, box, tiles, True))
            skeys.append((name, box, "dom"))

    # masked boundary phase for partial mount facets: a facet-edge
    # tile's out-of-facet pixels have grazing/backward planar
    # coordinates that bust every window budget, although the pixels
    # the facet actually covers are perfectly window-local. Re-run the
    # ladder on dom_neutral coordinates (invalid pixels filled with
    # their vreg's valid-pixel fit) and emit MERGE passes that write
    # only the valid pixels - identical values to the exact path
    # there, and the finish/synopsis masks never read the rest.
    rem = (assigned == -1) & ~excl
    if masked_merge and not has_sec and rem.any() \
            and src.spl is not None:
        covm = np.asarray(mask).reshape(nty, PR.TILE_H, ntx,
                                        PR.TILE_W)
        partial = covm.any(axis=(1, 3)) & ~covm.all(axis=(1, 3))
        for wc, name in order:
            cand = (assigned == -1) & partial & ~excl
            if not cand.any():
                break
            ys, xs = np.nonzero(cand)
            box = (int(ys.min()), int(ys.max()) + 1,
                   int(xs.min()), int(xs.max()) + 1)
            bty0, bty1, btx0, btx1 = box
            bntx = btx1 - btx0
            spl = _variant_spline(src, name)
            stats = _dom_stats(name, box)
            origins, fast = PR.classify_tiles(
                stats, spl.coeff.shape[0], spl.coeff.shape[1],
                spl.degree, wc)
            take = fast & cand[bty0:bty1, btx0:btx1]
            if take.any():
                assigned[bty0:bty1, btx0:btx1][take] = len(passes)
                iby, ibx = np.nonzero(take)
                org = origins[iby * bntx + ibx]
                tiles = np.column_stack(
                    [iby, ibx, iby + bty0, ibx + btx0,
                     org[:, 0], org[:, 1]]).astype(np.int32)
                if wc.shear_q:
                    ext = PR.row_block_shear(stats, tiles,
                                             spl.degree, wc)
                else:
                    ext = PR.row_block_origins(stats, tiles,
                                               spl.degree, wc)
                tiles = np.concatenate([tiles, ext], axis=1)
                passes.append((name, wc, box, tiles, True))
                skeys.append((name, box, "dom"))
    if os.environ.get("ENVUTIL_NO_CONSOLIDATE") != "1":
        passes, assigned, skeys = _consolidate_passes(
            passes, skeys, assigned, src, stats_cache,
            len(spread) if spread is not None else 0)
    if os.environ.get("ENVUTIL_NO_SHRINK") != "1":
        passes, assigned = _shrink_passes(
            passes, skeys, assigned, src, stats_cache,
            len(spread) if spread is not None else 0)
    return passes, assigned


# compiled fused frames keyed on the static pass structure (see
# fused_frame) - the per-frame tensors (rotation basis, window origins,
# tile selectors, coefficients) are traced, so interactive serving
# recompiles only when the *tile routing* changes, not per rotation
_FRAME_CACHE = {}


def _frame_builder(plan, src, window, classes=DEFAULT_CLASSES,
                   fi: int = 0, nch_out=None, brighten=None,
                   spread=None, pertap: bool = False, exclude=None,
                   finish: str = "image", preplanned=None,
                   tapsel: bool = False):
    """Build the one-jit fused frame for a solo render: per-pass
    coordinates restricted to the pass's tile bounding box, compact
    per-tile kernel grids writing into one donated canvas, and a
    single finish (mask + transpose + channel adaptation + brighten)
    at the end - the whole frame is one XLA program so the elementwise
    stages fuse. ``spread`` (bias-folded (cx, cy, w) taps) fuses the
    twining filter into the kernel passes.

    ``finish`` selects the frame's output contract:
      * ``"image"`` (default): ``frame(st, eps)`` returns the finished
        (H, W, nch_out) interleaved image.
      * ``"planar"``: ``frame(st, eps)`` returns the masked,
        brightened (nch_in, ph, pw) channel planes - no transpose and
        no channel adaptation (planar consumers interleave on host).
      * ``"reuse"``: ``frame(st, canvas, eps)`` takes the previous
        frame's (nch_in, ph, pw) canvas, donates it to the kernel
        passes instead of materializing fresh zeros, and returns
        ``(image, canvas)``. Only valid when no pass is a masked
        merge (every assigned tile is fully rewritten each frame);
        the builder asserts this. Unassigned (``assigned == -1``)
        tiles keep the donated canvas's previous content - callers
        must patch them every frame (the fast render paths do).

    ``pertap``: classify tiles for the *full* spread footprint but
    compile a single-tap frame whose tap coefficients come from the
    traced ``state['spread']`` (3 floats) and whose mask is NOT
    applied - the caller runs it once per tap and applies the per-tap
    deflected mask in the synopsis combine (the reference's per-tap
    champion semantics, envutil_payload.cc:611-691).

    Returns ``(frame_fn, state, assigned, passes)``; ``frame_fn(state,
    eps)`` is compiled (cached on the pass structure) and returns the
    finished (H, W, nch_out) image. ``eps`` is a float32 scalar added
    to the source coordinates (pass 0.0; benchmark harnesses use a
    vanishing carry-dependent value to defeat loop hoisting). Tiles
    with ``assigned == -1`` hold zeros and must be patched by the
    caller; ``assigned == ZERO_PASS`` tiles are genuinely empty."""
    # pertap frames use masked-merge too, but their kernel masks come
    # from the caller's per-tap deflected validity (st["tap_mask"] in
    # frame() below) rather than the undeflected coverage.
    # ``preplanned`` short-circuits the planner with an externally
    # prepared (passes, assigned) pair - the --mesh fast path plans
    # once globally and slices per band (split_passes_by_bands), so
    # every tile keeps the same (variant, class, origins) treatment
    # on any band decomposition.
    # tapsel: champion-routed per-pixel tap weights (the synopsis seam
    # band regrouped facet-major): the caller provides a canvas-shaped
    # (n_taps, ph, pw) int32 champion-id stack through state["champ"],
    # and every twined kernel pass weights tap ti by
    # w_ti * (champ[ti] == fi) per pixel - one union-tap instance per
    # facet replaces the K-tap per-facet loop on seam tiles. The
    # separable grid routing doesn't carry per-pixel weights, so
    # tapsel plans skip sep classes (no_sep).
    if preplanned is not None:
        passes, assigned = preplanned
    else:
        passes, assigned = plan_passes(plan, src, window, classes, fi,
                                       spread, exclude=exclude,
                                       want_union=not pertap,
                                       no_sep=tapsel)
    geom = _geom_static(plan)
    nch_out = plan.nchannels if nch_out is None else nch_out
    brighten = src.static.brighten if brighten is None else brighten
    nch_in = src.spl.coeff.shape[-1]
    y0, y1, x0, x1 = window
    ph, pw = y1 - y0, x1 - x0
    full_box = (0, ph // PR.TILE_H, 0, pw // PR.TILE_W)

    state = {"src": src, "basis": _basis_arg(plan, fi),
             "coeffs": {}, "tiles": []}
    # pre-pad each variant's coefficient planes to the aligned dims of
    # every class that reads them, ONCE at state-build time. Left to
    # the kernel wrappers, the edge-pad runs INSIDE the jitted frame
    # and XLA does not hoist it out of the serve/bench frame loops -
    # the device profile attributes 2.5 ms/frame (20%) of the 8K
    # headline to re-padding the tables every frame
    # (tools/profile_mosaic.py, 2026-08-19).
    need = {}
    for (name, wc, _b, _t, _m) in passes:
        mh, mw = need.get(name, (0, 0))
        need[name] = (max(mh, wc.win_h), max(mw, wc.win_w))
    for name, (mh, mw) in need.items():
        c = jnp.moveaxis(_variant_spline(src, name).coeff, -1, 0)
        _nc, hp_, wp_ = c.shape
        ha = max(mh, ((hp_ + 7) // 8) * 8)
        wa = max(mw, ((wp_ + 127) // 128) * 128)
        if (ha, wa) != (hp_, wp_):
            c = jnp.pad(c, ((0, 0), (0, ha - hp_), (0, wa - wp_)),
                        mode="edge")
        state["coeffs"][name] = c
    if pertap:
        state["spread"] = jnp.asarray(
            [spread[0][0], spread[0][1], 1.0], jnp.float32)
        # placeholder; the per-tap driver swaps in each tap's
        # deflected validity mask (float32 0/1) before calling frame
        state["tap_mask"] = jnp.ones((ph, pw), jnp.float32)
    elif tapsel:
        # facet id appended: the kernel routes tap weights per pixel
        # by comparing the champion-id stack against it
        state["spread"] = jnp.asarray(np.concatenate(
            [np.asarray(spread, np.float32).reshape(-1),
             np.asarray([fi], np.float32)]))
        # placeholder; the per-tap driver swaps in the frame's
        # champion-id stack before calling frame
        state["champ"] = jnp.zeros((len(spread), ph, pw), jnp.int32)
    elif spread is not None:
        state["spread"] = jnp.asarray(
            np.asarray(spread, np.float32).reshape(-1))
    sgrid_k = None
    if spread is not None and any(p[1].sep for p in passes):
        cxs, cys, wg = _spread_grid(spread)
        sgrid_k = (len(cxs), len(cys))
        state["spread_sep"] = jnp.asarray(
            np.asarray(cxs + cys + wg, np.float32))
    state["inline"] = {}
    inline_info = {}
    for pi, (name, wc, box, tiles, merge) in enumerate(passes):
        state["tiles"].append(jnp.asarray(tiles))
        # inline-coords kernels don't carry the champion-id stack
        smode = (None if tapsel else
                 _inline_eligible(plan, src, fi, name, spread, merge))
        if smode is None:
            continue
        if plan.projection in (Projection.CUBEMAP,
                               Projection.BIATAN6):
            r0 = window[0] + tiles[:, 2] * PR.TILE_H
            faces = r0 // plan.width
            if not (faces == (r0 + PR.TILE_H - 1)
                    // plan.width).all():
                continue  # a tile straddles a face boundary
            faces = np.clip(faces, 0, 5).astype(np.int32)
        else:
            faces = np.zeros(tiles.shape[0], np.int32)
        spl = _variant_spline(src, name)
        stt = src.static
        if smode == "sph":
            statics = (stt.total_extent.x0, stt.total_extent.x1,
                       stt.total_extent.y0, stt.total_extent.y1,
                       stt.total_width, stt.total_height,
                       stt.window_x_offset, stt.window_y_offset)
        else:
            m = stt.metrics
            statics = (m.refc_md, m.model_to_px, m.section_px)
        tmode, xfeat, yfeat, P, consts = _inline_setup(
            geom, window, name, spl.core_shape, spl.pad,
            tuple(spl.bcs), statics, twined=spread is not None,
            smode=smode)
        state["inline"][pi] = (jnp.asarray(xfeat),
                               jnp.asarray(yfeat),
                               jnp.asarray(faces))
        inline_info[pi] = (tmode, consts, smode,
                           name.startswith("pitched"), P)

    full_cover = src.spl is not None and bool(
        getattr(src.spl, "spherical", False))

    struct = tuple((name, wc, box,
                    _variant_spline(src, name).degree,
                    _variant_spline(src, name).coeff.shape,
                    tiles.shape[0], merge,
                    inline_info.get(pi, (None,))[:3])
                   for pi, (name, wc, box, tiles, merge)
                   in enumerate(passes))
    key = (geom, window, tuple(classes), fi, nch_out, float(brighten),
           nch_in, struct,
           tuple(spread) if spread is not None else None, pertap,
           tapsel)

    n_taps = 0 if spread is None else (1 if pertap else len(spread))

    if finish == "reuse":
        assert not any(p[4] for p in passes), \
            "finish='reuse' requires full-tile passes (no merges)"

    # in-kernel interleaved finish (opt-in, ENVUTIL_INTERLEAVE=1):
    # 3-channel frames write the canvas as (ph, 3*pw)
    # pixel-interleaved rows (PR._emit_rows), making the final
    # reshape to (H, W, 3) a layout no-op - the XLA
    # planar->interleaved relayout disappears. Measured on chip this
    # is a net LOSS (the emit's 9 extra gathers per row block
    # contend with the gather-bound inner loop and cost more than
    # the relayout they remove - see PR._ILV_ON), so the default
    # finish stays planar + relayout. pertap/tapsel frames are
    # summed/combined planar by their drivers, and 'planar' finish
    # is the multi-facet synopsis contract, so those never
    # interleave.
    ilv = (nch_in == 3 and nch_out == 3 and not pertap and not tapsel
           and finish != "planar" and PR._ILV_ON)

    def run_passes(st, canvas, eps):
        mask0 = None
        for pi, (name, wc, box, degree, _shape, _nt, merge,
                 inline) in enumerate(struct):
            if inline[0] is not None:
                # coordinate chain fused into the kernel: no XLA
                # coordinate pass, no sx/sy HBM round trip
                tmode, consts, smode = inline
                _t2, _c2, _s2, pitched, P = inline_info[pi]
                bas = st["basis"]
                if pitched:
                    bas = jnp.asarray(
                        np.asarray(PITCH_BASIS.T, np.float32)) @ bas
                bm = jnp.einsum("ij,fjk->fik", bas,
                                jnp.asarray(P)).reshape(-1, 9)
                xfeat, yfeat, fcs = st["inline"][pi]
                if spread is None:
                    canvas = PR.resample_inline_into(
                        canvas, st["coeffs"][name], st["tiles"][pi],
                        fcs, xfeat, yfeat, bm, eps, degree=degree,
                        tmode=tmode, consts=consts, smode=smode,
                        wc=wc, unroll=_want_unroll(wc),
                        interleave=ilv)
                else:
                    sp = st["spread_sep"] if wc.sep else st["spread"]
                    canvas = PR.resample_inline_twined_into(
                        canvas, st["coeffs"][name], st["tiles"][pi],
                        fcs, xfeat, yfeat, bm, sp, eps,
                        degree=degree, n_taps=n_taps, tmode=tmode,
                        consts=consts, smode=smode, wc=wc,
                        grid=sgrid_k if wc.sep else None,
                        interleave=ilv)
                continue
            bwin = _box_window(window, box)
            c0 = _coords(geom, bwin, name, st["src"], fi, (0.0, 0.0),
                         st["basis"], dom_neutral=merge)
            sx, sy, m = c0[0], c0[1], c0[2]
            if (pi == 0 and box == full_box
                    and not name.startswith("sec")):
                # sec "masks" carry face dominance, not validity
                mask0 = m
            mm = m.astype(jnp.float32) if merge else None
            if merge and pertap and not name.startswith("sec"):
                # per-tap frames: the caller supplies the TAP's own
                # deflected validity through the state, so merge
                # passes write exactly the pixels this tap's synopsis
                # mask keeps. Band pixels just outside the strict
                # validity read fit-extrapolated, valid-span-clamped
                # coordinates (masked_coord_fill) - within ~1 px of
                # the exact pickup, replacing a per-tap XLA patch.
                ty0, ty1, tx0, tx1 = box
                mm = st["tap_mask"][ty0 * PR.TILE_H:ty1 * PR.TILE_H,
                                    tx0 * PR.TILE_W:tx1 * PR.TILE_W]
            if spread is None:
                canvas = PR.resample_planar_into(
                    canvas, st["coeffs"][name], sx + eps, sy,
                    st["tiles"][pi], degree=degree, wc=wc,
                    unroll=_want_unroll(wc),
                    merge_mask=mm, interleave=ilv)
            else:
                fmk = m if merge else None
                c10 = _coords(geom, bwin, name, st["src"], fi,
                              (ST.DERIV_BIAS, 0.0), st["basis"],
                              dom_neutral=merge, fill_mask=fmk)
                c01 = _coords(geom, bwin, name, st["src"], fi,
                              (0.0, ST.DERIV_BIAS), st["basis"],
                              dom_neutral=merge, fill_mask=fmk)
                dux, dvx = _deriv(sx, c10[0], c01[0])
                duy, dvy = _deriv(sy, c10[1], c01[1])
                sp = st["spread_sep"] if wc.sep else st["spread"]
                canvas = PR.resample_twined_into(
                    canvas, st["coeffs"][name], sx + eps, sy,
                    dux, duy, dvx, dvy, st["tiles"][pi],
                    sp, degree=degree, n_taps=n_taps,
                    wc=wc, merge_mask=None if tapsel else mm,
                    grid=sgrid_k if wc.sep else None,
                    champ=st["champ"] if tapsel else None,
                    interleave=ilv)
        return canvas, mask0

    def masked(st, canvas, mask0):
        if pertap or tapsel or full_cover:
            # per-tap frames are masked by the caller; tapsel frames
            # carry validity in the per-pixel tap weights (an invalid
            # facet is never a pixel's champion); full-spherical
            # sources cover every ray, so the finish mask is identity
            px = canvas
        else:
            if mask0 is None:  # rare: first pass didn't span the window
                _sx, _sy, mask0, _z2 = _coords(geom, window, "orig",
                                               st["src"], fi,
                                               (0.0, 0.0), st["basis"])
            px = jnp.where(mask0[None], canvas, 0.0)
        return px

    def finish_img(px):
        img = jnp.moveaxis(px, 0, -1)
        img = E.repix(img, nch_out)
        if brighten != 1.0:
            img = E.apply_brighten(img, brighten)
        return img

    def finish_ilv(st, canvas, mask0):
        # the canvas bytes ARE the row-major (H, W, 3) image - the
        # reshape is layout-free, no relayout op exists
        img = canvas.reshape(ph, pw, 3)
        if not (pertap or tapsel or full_cover):
            if mask0 is None:
                _sx, _sy, mask0, _z2 = _coords(geom, window, "orig",
                                               st["src"], fi,
                                               (0.0, 0.0),
                                               st["basis"])
            img = jnp.where(mask0[..., None], img, 0.0)
        if brighten != 1.0:
            img = E.apply_brighten(img, brighten)
        return img

    canvas_shape = (ph, 3 * pw) if ilv else (nch_in, ph, pw)

    if finish == "planar":
        def frame(st, eps):
            canvas = jnp.zeros((nch_in, ph, pw), jnp.float32)
            canvas, mask0 = run_passes(st, canvas, eps)
            px = masked(st, canvas, mask0)
            if brighten != 1.0:
                px = E.apply_brighten_planar(px, brighten)
            return px
    elif finish == "reuse":
        def frame(st, canvas, eps):
            canvas, mask0 = run_passes(st, canvas, eps)
            if ilv:
                return finish_ilv(st, canvas, mask0), canvas
            return finish_img(masked(st, canvas, mask0)), canvas
    else:
        def frame(st, eps):
            canvas = jnp.zeros(canvas_shape, jnp.float32)
            canvas, mask0 = run_passes(st, canvas, eps)
            if ilv:
                return finish_ilv(st, canvas, mask0)
            return finish_img(masked(st, canvas, mask0))

    key = key + (finish, ilv)
    return frame, state, assigned, passes, key, canvas_shape


def fused_frame(plan, src, window, classes=DEFAULT_CLASSES,
                fi: int = 0, nch_out=None, brighten=None,
                spread=None, pertap: bool = False, exclude=None,
                finish: str = "image", preplanned=None,
                tapsel: bool = False):
    frame, state, assigned, passes, key, canvas_shape = \
        _frame_builder(
            plan, src, window, classes, fi, nch_out, brighten, spread,
            pertap, exclude=exclude, finish=finish,
            preplanned=preplanned, tapsel=tapsel)
    fn = _FRAME_CACHE.get(key)
    if fn is None:
        if finish == "reuse":
            # eager (serve-mode) callers really do recycle the canvas
            # buffer; inside an outer jit the donation is inlined away
            fn = jax.jit(frame, donate_argnums=(1,))
        else:
            fn = jax.jit(frame)
        _FRAME_CACHE[key] = fn
    # finish='reuse' callers allocate the carried canvas themselves;
    # its shape depends on the in-kernel interleave admission
    fn.canvas_shape = canvas_shape
    return fn, state, assigned, passes


# one-jit multi-facet frames keyed on the per-facet pass structures
_MULTI_CACHE = {}
# one-jit per-tap twined multi-facet frames (tap loop inside the jit)
_PERTAP_CACHE = {}


def fused_multi_frame(plan, sources, window, classes=DEFAULT_CLASSES,
                      preplanned_list=None):
    """One-jit multi-facet frame: every facet's fused kernel passes,
    its validity mask and voronoi score, the exact XLA patches of any
    unfused tiles, and the synopsis combine in a single compiled
    program - one device dispatch per frame instead of per-facet
    frame + mask + patch + combine dispatches (which dominate through
    a remote device tunnel). The per-facet mask coordinates CSE with
    the frame's own coordinate passes inside the one program.

    ``preplanned_list`` (one (passes, assigned) per facet) bypasses
    the planner - the --mesh path plans once globally and slices per
    band (split_passes_by_bands), so every tile keeps its
    single-device treatment on any band decomposition.

    Returns (fn, states, assigneds, passes_list); ``fn(states, eps)``
    yields the combined (H, W, nch) image. Unfused (-1) tiles are
    patched in-program via the batched XLA tile scan; callers should
    still decline facets with *no* fused coverage (the scan is ~100x
    the kernel rate)."""
    geom = _geom_static(plan)
    frames, states, assigneds, passes_list, keys = [], [], [], [], []
    bads = []
    for fi, src in enumerate(sources):
        pp = preplanned_list[fi] if preplanned_list is not None \
            else None
        frame, st, assigned, passes, key, _cs = _frame_builder(
            plan, src, window, classes, fi=fi, preplanned=pp)
        frames.append(frame)
        states.append(st)
        assigneds.append(assigned)
        passes_list.append(passes)
        keys.append(key)
        bads.append(tuple(map(tuple, np.argwhere(assigned == -1))))

    statics = tuple(src.static for src in sources)
    degrees = tuple(src.spl.degree for src in sources)
    brightens = tuple(float(src.static.brighten) for src in sources)

    def combined(sts, eps):
        pxs, masks, scores = [], [], []
        for fi in range(len(frames)):
            img = frames[fi](sts[fi], eps)
            sx, sy, m, z = _coords(geom, window, "orig",
                                   sts[fi]["src"], fi, (0.0, 0.0),
                                   sts[fi]["basis"])
            if bads[fi]:
                img = _patch_tiles_batch(
                    img, sts[fi]["src"].spl.coeff, sx, sy, m,
                    _bad_origins(np.asarray(bads[fi])), degrees[fi],
                    plan.nchannels, brightens[fi])
            pxs.append(img)
            masks.append(m)
            scores.append(jnp.where(
                m, z * statics[fi].recip_step,
                float(np.finfo(np.float32).min)))
        return _combine_stack(plan, sources, pxs, masks, scores)

    mkey = (tuple(keys), plan.synopsis, plan.nchannels,
            tuple(float(s.recip_step) for s in statics),
            tuple(bads), degrees, brightens)
    fn = _MULTI_CACHE.get(mkey)
    if fn is None:
        fn = _MULTI_CACHE[mkey] = jax.jit(combined)
    return fn, states, assigneds, passes_list


@jax.jit
def _deriv(c0, c10, c01):
    """Coordinate derivative vectors from the three biased grids (the
    reference's ninepack differencing, twining.h:236-238)."""
    return c10 - c0, c01 - c0


@functools.partial(jax.jit, static_argnames=("degree", "spread",
                                             "nch_out", "brighten",
                                             "use_mask"))
def _patch_tiles_batch_twined(img, coeff, sx, sy, dux, duy, dvx, dvy,
                              mask, origins, degree, spread, nch_out,
                              brighten, use_mask=True):
    """Twined analogue of _patch_tiles_batch: one compiled scan over
    the listed tile origins."""
    def body(im, oyx):
        oy, ox = oyx[0], oyx[1]
        tile = _eval_tile_xla_twined(coeff, sx, sy, dux, duy, dvx,
                                     dvy, (oy, ox), degree, spread)
        if use_mask:
            m = jax.lax.dynamic_slice(mask, (oy, ox),
                                      (PR.TILE_H, PR.TILE_W))
            tile = _finish(jnp.moveaxis(tile, -1, 0), m, nch_out,
                           brighten)
        else:
            tile = E.repix(tile, nch_out)
            if brighten != 1.0:
                tile = E.apply_brighten(tile, brighten)
        zero = jnp.zeros((), oy.dtype)
        return jax.lax.dynamic_update_slice(im, tile,
                                            (oy, ox, zero)), 0

    img, _ = jax.lax.scan(body, img, origins)
    return img


@functools.partial(jax.jit, static_argnames=("degree", "spread",
                                             "nch_out", "brighten"))
def _patch_tiles_batch_twined_pertap(img, coeff, sx, sy, dux, duy,
                                     dvx, dvy, tap_masks, origins,
                                     degree, spread, nch_out,
                                     brighten):
    """Per-tap-masked twined XLA patch: tap t contributes
    ``w_t * where(mask_t, eval(deflected_t), 0)`` - the reference's
    solo synopsis under twining (envutil_payload.cc:611-691), where
    each tap is gated by its OWN deflected-ray validity. Used for the
    facet-edge band tiles of a partial twined render, whose tap masks
    genuinely differ across the spread. ``tap_masks`` is (K, H, W)
    bool from _tap_mask_score per tap."""
    def body(im, oyx):
        oy, ox = oyx[0], oyx[1]
        size = (PR.TILE_H, PR.TILE_W)
        sl = lambda a: jax.lax.dynamic_slice(a, (oy, ox), size)
        spl = S.Spline2D(coeff=coeff, pad=0, degree=degree,
                         bcs=(S.CONSTANT, S.CONSTANT),
                         core_shape=coeff.shape[:2])
        acc = None
        for ti, (cx, cy, wgt) in enumerate(spread):
            v = S.eval_spline(
                spl, sl(sx) + cx * sl(dux) + cy * sl(dvx),
                sl(sy) + cx * sl(duy) + cy * sl(dvy),
                apply_gate=False)
            m = jax.lax.dynamic_slice(tap_masks[ti], (oy, ox), size)
            term = wgt * jnp.where(m[..., None], v, 0.0)
            acc = term if acc is None else acc + term
        tile = E.repix(acc, nch_out)
        if brighten != 1.0:
            tile = E.apply_brighten(tile, brighten)
        zero = jnp.zeros((), oy.dtype)
        return jax.lax.dynamic_update_slice(im, tile,
                                            (oy, ox, zero)), 0

    img, _ = jax.lax.scan(body, img, origins)
    return img


def _patch_tiles_batch_tap(img, coeff, sx, sy, dux, duy, dvx, dvy,
                           origins, degree, tap, nch_out, brighten):
    """Single-tap variant of _patch_tiles_batch_twined with a *traced*
    tap deflection (cx, cy) - used inside the one-jit per-tap frame's
    tap loop, where the deflection is a loop-carried tensor."""
    cx, cy = tap[0], tap[1]

    def body(im, oyx):
        oy, ox = oyx[0], oyx[1]
        size = (PR.TILE_H, PR.TILE_W)
        sl = lambda a: jax.lax.dynamic_slice(a, (oy, ox), size)
        spl = S.Spline2D(coeff=coeff, pad=0, degree=degree,
                         bcs=(S.CONSTANT, S.CONSTANT),
                         core_shape=coeff.shape[:2])
        tile = S.eval_spline(
            spl, sl(sx) + cx * sl(dux) + cy * sl(dvx),
            sl(sy) + cx * sl(duy) + cy * sl(dvy), apply_gate=False)
        tile = E.repix(tile, nch_out)
        if brighten != 1.0:
            tile = E.apply_brighten(tile, brighten)
        zero = jnp.zeros((), oy.dtype)
        return jax.lax.dynamic_update_slice(im, tile,
                                            (oy, ox, zero)), 0

    img, _ = jax.lax.scan(body, img, origins)
    return img


@functools.partial(jax.jit, static_argnames=("degree", "spread"))
def _eval_tile_xla_twined(coeff, sx, sy, dux, duy, dvx, dvy, origin,
                          degree, spread):
    """Exact XLA fallback for one tile of a twined render (taps
    unrolled statically)."""
    oy, ox = origin
    size = (PR.TILE_H, PR.TILE_W)
    sl = lambda a: jax.lax.dynamic_slice(a, (oy, ox), size)
    sxt, syt = sl(sx), sl(sy)
    duxt, duyt, dvxt, dvyt = sl(dux), sl(duy), sl(dvx), sl(dvy)
    spl = S.Spline2D(coeff=coeff, pad=0, degree=degree,
                     bcs=(S.CONSTANT, S.CONSTANT),
                     core_shape=coeff.shape[:2])
    acc = None
    for (cx, cy, wgt) in spread:
        v = S.eval_spline(spl, sxt + cx * duxt + cy * dvxt,
                          syt + cx * duyt + cy * dvyt,
                          apply_gate=False)
        term = wgt * v
        acc = term if acc is None else acc + term
    return acc



def _basis_arg(plan, fi):
    """Traced rotation argument for _coords (None for generic chains)."""
    if plan.planar_to_ray[fi] is not None:
        return None
    return jnp.asarray(np.asarray(plan.bases[fi], np.float32))

def _render_fast_solo_twined_partial(plan, src, window, out_h, out_w,
                                     verbose: bool, classes
                                     ) -> Optional[np.ndarray]:
    """Twined render of a PARTIAL facet via core/band decomposition.

    A partial facet's twined render weights each tap by the tap's own
    deflected validity (solo synopsis, envutil_payload.cc:611-691), so
    the fused kernel's shared-mask evaluation is only exact where ALL
    taps are valid. A tap at spread offset (cx, cy) samples the
    validity field at output position (x+cx, y+cy) (the ninepack
    deflection is the first-order ray at that position), so eroding
    the center mask by ceil(max|c|)+1 output pixels bounds the
    all-taps-valid region:

      * interior tiles (eroded mask everywhere): ONE fused twined
        kernel pass serves all K taps (union-tap classes apply) -
        this was previously K per-tap frames;
      * band tiles (within the dilated mask but not interior): exact
        per-tap XLA evaluation with per-tap deflected masks
        (_patch_tiles_batch_twined_pertap);
      * tiles beyond the dilated mask: zero.
    """
    from scipy import ndimage

    y0, y1, x0, x1 = window
    ph, pw = y1 - y0, x1 - x0
    nty, ntx = ph // PR.TILE_H, pw // PR.TILE_W
    geom = _geom_static(plan)
    basis = _basis_arg(plan, 0)
    bias = 1.0 / ST.DERIV_BIAS
    spread = tuple((float(cx) * bias, float(cy) * bias, float(w))
                   for (cx, cy, w) in plan.spread)

    c0 = _coords(geom, window, "orig", src, 0, (0.0, 0.0), basis)
    mask_np = np.asarray(c0[2], bool)
    rx = int(math.ceil(max(abs(c[0]) for c in plan.spread))) + 1
    ry = int(math.ceil(max(abs(c[1]) for c in plan.spread))) + 1
    size = (2 * ry + 1, 2 * rx + 1)
    m8 = mask_np.astype(np.uint8)
    core = ndimage.minimum_filter(m8, size=size, mode="constant",
                                  cval=0).astype(bool)
    reach = ndimage.maximum_filter(m8, size=size, mode="constant",
                                   cval=0).astype(bool)
    tview = lambda a: a.reshape(nty, PR.TILE_H, ntx, PR.TILE_W)
    core_t = tview(core).all(axis=(1, 3))
    band_t = tview(reach).any(axis=(1, 3)) & ~core_t

    frame_fn, state, assigned, passes = fused_frame(
        plan, src, window, classes, spread=spread, exclude=band_t)
    n_fast = int((assigned >= 0).sum())
    n_band = int(band_t.sum())
    if n_fast == 0 and core_t.any():
        return None  # interior entirely unfusable: use the XLA path

    # band tiles through the champion-routed kernel where admitted:
    # with a single facet the 'champion' stack is just per-tap
    # validity (champ_k = 0 where tap k's deflected ray is valid,
    # -1 elsewhere), so one union-tap kernel instance computes
    # sum_k w_k * [mask_k] * v_k - the same sum
    # _patch_tiles_batch_twined_pertap evaluates at the XLA rate,
    # tap-major (the reference's solo synopsis under twining,
    # envutil_payload.cc:611-691)
    band_frame = band_state = None
    # the band frame is summed with the finished core frame; finish
    # (repix/deassoc) must be linear for that, so only decompose when
    # no channel conversion happens (else repix's appended alpha=1
    # plane would sum to 2, and 2->1 deassoc is non-linear)
    if band_t.any() and plan.nchannels == src.spl.coeff.shape[-1] \
            and os.environ.get("ENVUTIL_NO_TAPSEL") != "1":
        passes_b, assigned_b = plan_passes(
            plan, src, window, classes, 0, spread, exclude=~band_t,
            want_union=True, no_sep=True)
        if int((assigned_b >= 0).sum()):
            band_frame, band_state, _ab, _pb = fused_frame(
                plan, src, window, classes, spread=spread,
                tapsel=True, preplanned=(passes_b, assigned_b))
            # -3: tile served by the champion-routed band frame (not
            # a core pass index, not the -1 the patcher collects)
            assigned = np.where(assigned_b >= 0, -3, assigned)
    if verbose:
        mix = ", ".join(f"{n}/{wc.name}:{(assigned == pi).sum()}"
                        for pi, (n, wc, _b, _t, _m) in enumerate(passes))
        n_tsel = 0 if band_frame is None \
            else int((assigned_b >= 0).sum())
        print(f"fastpath(twined/partial): {n_fast}/{assigned.size} "
              f"tiles fused ({mix}), {n_band} band tiles "
              f"({n_tsel} champion-routed, "
              f"{int((assigned == -1).sum())} per-tap), "
              f"{len(spread)} taps")
    combined = frame_fn(state, jnp.float32(0))

    bad = np.argwhere(assigned == -1)
    if bad.size or band_frame is not None:
        tap_masks = jnp.stack(
            [_tap_mask_score(geom, window, src, 0,
                             jnp.asarray([cx, cy], jnp.float32),
                             basis)[0]
             for (cx, cy, _w) in plan.spread])
    if band_frame is not None:
        st_b = dict(band_state)
        st_b["champ"] = jnp.where(tap_masks, 0, -1).astype(jnp.int32)
        combined = combined + band_frame(st_b, jnp.float32(0))
    if bad.size:
        c10 = _coords(geom, window, "orig", src, 0,
                      (ST.DERIV_BIAS, 0.0), basis)
        c01 = _coords(geom, window, "orig", src, 0,
                      (0.0, ST.DERIV_BIAS), basis)
        sx, sy = c0[0], c0[1]
        dux, dvx = _deriv(sx, c10[0], c01[0])
        duy, dvy = _deriv(sy, c10[1], c01[1])
        combined = _patch_tiles_batch_twined_pertap(
            combined, src.spl.coeff, sx, sy, dux, duy, dvx, dvy,
            tap_masks, _bad_origins(bad), src.spl.degree, spread,
            plan.nchannels, float(src.static.brighten))

    img = np.array(jax.device_get(combined), np.float32)
    return img[:out_h, :out_w]


def render_fast_twined(plan, sources, verbose: bool = False,
                       classes=None) -> Optional[np.ndarray]:
    """Solo render with the twining filter fused into the kernel. Tap
    positions are linearized in coordinate space (the reference
    linearizes in ray space with the same sub-pixel differencing); the
    validity mask is the center tap's."""
    if not eligible(plan, sources, allow_spread=True):
        return None
    src = sources[0]
    if plan.crop is not None:
        y0, y1, x0, x1 = plan.crop
    else:
        y0, y1, x0, x1 = 0, plan.height, 0, plan.width
    out_h, out_w = y1 - y0, x1 - x0
    ph = _round_up(out_h, PR.TILE_H)
    pw = _round_up(out_w, PR.TILE_W)
    window = (y0, y0 + ph, x0, x0 + pw)
    if classes is None:
        bias0 = 1.0 / ST.DERIV_BIAS
        sp0 = tuple((float(cx) * bias0, float(cy) * bias0, float(w))
                    for (cx, cy, w) in plan.spread)
        classes = select_classes(plan, src, window, spread=sp0,
                                 verbose=verbose)

    full_cover = (src.static.kind == "cubemap"
                  or src.static.full_fisheye
                  or (src.spl is not None and src.spl.spherical))
    if not full_cover:
        # a partial facet's twined render masks each tap with the
        # tap's own DEFLECTED validity (the reference's solo synopsis,
        # envutil_payload.cc:611-691); the center-tap mask the fused
        # frame applies would mis-paint the facet-edge band. Interior
        # tiles (all taps provably valid) run ONE fused twined frame;
        # the edge band is patched per tap with exact deflected masks.
        return _render_fast_solo_twined_partial(plan, sources[0],
                                                window, out_h, out_w,
                                                verbose, classes)

    # spread with the 1/bias factor folded in (synopsis_t semantics)
    bias = 1.0 / ST.DERIV_BIAS
    spread = tuple((float(cx) * bias, float(cy) * bias, float(w))
                   for (cx, cy, w) in plan.spread)

    frame_fn, state, assigned, passes = fused_frame(
        plan, src, window, classes, spread=spread)
    n_fast = int((assigned >= 0).sum())
    if verbose:
        mix = ", ".join(f"{n}/{wc.name}:{(assigned == pi).sum()}"
                        for pi, (n, wc, _b, _t, _m) in enumerate(passes))
        print(f"fastpath(twined): {n_fast}/{assigned.size} tiles fused"
              f" ({mix}), {len(spread)} taps")
    if n_fast == 0:
        return None
    combined = frame_fn(state, jnp.float32(0))

    bad = np.argwhere(assigned == -1)
    if bad.size:
        if verbose:
            print(f"fastpath(twined): {len(bad)} tiles via XLA fallback")
        geom = _geom_static(plan)
        basis = _basis_arg(plan, 0)
        c0 = _coords(geom, window, "orig", src, 0, (0.0, 0.0), basis)
        c10 = _coords(geom, window, "orig", src, 0,
                      (ST.DERIV_BIAS, 0.0), basis)
        c01 = _coords(geom, window, "orig", src, 0,
                      (0.0, ST.DERIV_BIAS), basis)
        sx, sy, mask = c0[0], c0[1], c0[2]
        dux, dvx = _deriv(sx, c10[0], c01[0])
        duy, dvy = _deriv(sy, c10[1], c01[1])
        combined = _patch_tiles_batch_twined(
            combined, src.spl.coeff, sx, sy, dux, duy, dvx, dvy,
            mask, _bad_origins(bad), src.spl.degree, spread,
            plan.nchannels, src.static.brighten)

    img = np.array(jax.device_get(combined), np.float32)
    return img[:out_h, :out_w]


def render_fast(plan, sources, render_window_fn=None,
                verbose: bool = False,
                classes=None) -> Optional[np.ndarray]:
    """Render via the Pallas path; returns None if not eligible.
    ``classes=None`` selects the ladder per frame (select_classes)."""
    if plan.spread is not None and len(sources) == 1:
        return render_fast_twined(plan, sources, verbose, classes)
    if len(sources) > 1:
        return render_fast_multi(plan, sources, verbose,
                                 classes or DEFAULT_CLASSES)
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
    window = (y0, y0 + ph, x0, x0 + pw)
    if classes is None:
        classes = select_classes(plan, src, window, verbose=verbose)

    frame_fn, state, assigned, passes = fused_frame(
        plan, src, window, classes)
    n_fast = int((assigned >= 0).sum())
    n_zero = int((assigned == ZERO_PASS).sum())
    if verbose:
        used = {}
        for pi, (name, wc, _box, _o, _m) in enumerate(passes):
            k = f"{name}/{wc.name}"
            used[k] = used.get(k, 0) + int((assigned == pi).sum())
        extra = f", {n_zero} empty" if n_zero else ""
        print(f"fastpath: {n_fast}/{assigned.size} tiles fused "
              f"({', '.join(f'{k}:{v}' for k, v in used.items() if v)}"
              f"{extra})")
    if n_fast == 0:
        if n_zero < assigned.size:
            return None  # nothing fused: use the XLA path
        img = np.zeros((ph, pw, plan.nchannels), np.float32)
        return img[:out_h, :out_w]
    combined = frame_fn(state, jnp.float32(0))

    bad = np.argwhere(assigned == -1)
    if bad.size:
        if verbose:
            print(f"fastpath: {len(bad)} tiles via XLA fallback")
        geom = _geom_static(plan)
        basis = _basis_arg(plan, 0)
        sx0, sy0, mask0, _z = _coords(geom, window, "orig", src, 0,
                                      (0.0, 0.0), basis)
        combined = _patch_tiles_batch(
            combined, src.spl.coeff, sx0, sy0, mask0,
            _bad_origins(bad), src.spl.degree, plan.nchannels,
            src.static.brighten)
    img = np.array(jax.device_get(combined), np.float32)
    return img[:out_h, :out_w]


def split_passes_by_bands(passes, assigned, n_bands: int):
    """Slice a globally planned pass structure into ``n_bands``
    horizontal tile-row bands. Every tile keeps exactly the treatment
    the global plan gave it - same variant, window class, source-window
    origin and per-row-block candidate origins (those live in the tile
    rows and are sliced along) - so a band-decomposed render is
    bit-equal to the single-device fused frame. Per-band pass boxes are
    re-derived as the bounding box of the band's tiles; the coordinate
    passes are window-absolute, so re-boxing changes which pixels are
    computed, never their values.

    Returns a list of (passes_b, assigned_b) pairs; assigned_b's pass
    indices are band-local (empty passes dropped)."""
    nty, ntx = assigned.shape
    assert nty % n_bands == 0, (nty, n_bands)
    bh = nty // n_bands
    out = []
    for b in range(n_bands):
        ty0, ty1 = b * bh, (b + 1) * bh
        a = assigned[ty0:ty1]
        a2 = a.copy()
        passes_b = []
        for pi, (name, wc, _box, tiles, merge) in enumerate(passes):
            sel = (tiles[:, 2] >= ty0) & (tiles[:, 2] < ty1)
            if not sel.any():
                assert not (a == pi).any()
                continue
            t = tiles[sel].copy()
            t[:, 2] -= ty0
            nb = (int(t[:, 2].min()), int(t[:, 2].max()) + 1,
                  int(t[:, 3].min()), int(t[:, 3].max()) + 1)
            t[:, 0] = t[:, 2] - nb[0]
            t[:, 1] = t[:, 3] - nb[2]
            a2[a == pi] = len(passes_b)
            passes_b.append((name, wc, nb, t, merge))
        out.append((passes_b, a2))
    return out


def _band_windows(window, mesh_n: int):
    band_rows = (window[1] - window[0]) // mesh_n
    return [(window[0] + k * band_rows,
             window[0] + (k + 1) * band_rows, window[2], window[3])
            for k in range(mesh_n)]


def render_fast_mesh(plan, sources, mesh_n: int, verbose: bool = False,
                     classes=None) -> Optional[np.ndarray]:
    """--mesh N through the FUSED kernel: the same Pallas pass
    structure the single-device fast path runs, planned once over the
    whole frame and dispatched per output-row band, each band's frame
    on its own device - the reference's thread-pool tile decomposition
    (wielding.h:270-451) ridden on the device mesh with zero
    communication (sources replicated per device). Per-tile treatment
    is identical to single-device (split_passes_by_bands), so the
    composite is bit-equal to the single-device fast paths;
    XLA-fallback tiles are patched per band on the band's device.

    Covers the full fast-path family (VERDICT r3 item 2): solo frames,
    twined solo frames (full-cover and partial core/band), multi-facet
    stitches (one-jit per band incl. patches), and twined multi-facet
    stitches (champion-stable per-tap frames - stability analyzed
    once globally, plans band-sliced). Returns None when the
    configuration can't band-decompose (caller falls back to the XLA
    sharded render)."""
    devices = jax.devices()
    if len(devices) < mesh_n:
        return None
    if plan.crop is not None:
        y0, y1, x0, x1 = plan.crop
    else:
        y0, y1, x0, x1 = 0, plan.height, 0, plan.width
    out_h, out_w = y1 - y0, x1 - x0
    ph = _round_up(out_h, PR.TILE_H)
    pw = _round_up(out_w, PR.TILE_W)
    nty = ph // PR.TILE_H
    if nty % mesh_n != 0:
        if verbose:
            print(f"--mesh {mesh_n}: {nty} tile rows don't split into "
                  f"{mesh_n} bands; using the XLA sharded render")
        return None
    window = (y0, y0 + ph, x0, x0 + pw)

    if len(sources) == 1:
        src = sources[0]
        if plan.spread is None:
            if not eligible(plan, sources):
                return None
            img = _mesh_solo(plan, src, window, mesh_n, devices,
                             verbose, classes)
        else:
            if not eligible(plan, sources, allow_spread=True):
                return None
            full_cover = (src.static.kind == "cubemap"
                          or src.static.full_fisheye
                          or (src.spl is not None
                              and src.spl.spherical))
            if full_cover:
                img = _mesh_solo_twined(plan, src, window, mesh_n,
                                        devices, verbose, classes)
            else:
                img = _mesh_solo_twined_partial(plan, src, window,
                                                mesh_n, devices,
                                                verbose, classes)
    else:
        if not _eligible_multi(plan, sources):
            return None
        if plan.spread is None:
            img = _mesh_multi(plan, sources, window, mesh_n, devices,
                              verbose, classes or DEFAULT_CLASSES)
        else:
            img = _mesh_multi_pertap(plan, sources, window, mesh_n,
                                     devices, verbose,
                                     classes or DEFAULT_CLASSES)
    if img is None:
        return None
    return img[:out_h, :out_w]


def _gather_bands(outs) -> np.ndarray:
    return np.concatenate(
        [np.asarray(jax.device_get(o), np.float32) for o in outs],
        axis=0)


def _mesh_solo(plan, src, window, mesh_n, devices, verbose, classes):
    if classes is None:
        classes = select_classes(plan, src, window, verbose=verbose)
    passes, assigned = plan_passes(plan, src, window, classes)
    n_fast = int((assigned >= 0).sum())
    if n_fast == 0:
        return None
    if verbose:
        used = {}
        for pi, (name, wc, _box, _o, _m) in enumerate(passes):
            k = f"{name}/{wc.name}"
            used[k] = used.get(k, 0) + int((assigned == pi).sum())
        print(f"fastpath(mesh): {n_fast}/{assigned.size} tiles fused "
              f"({', '.join(f'{k}:{v}' for k, v in used.items() if v)})"
              f" over {mesh_n} devices")

    geom = _geom_static(plan)
    bands = split_passes_by_bands(passes, assigned, mesh_n)
    outs = []
    for k, ((passes_b, a_b), wb) in enumerate(
            zip(bands, _band_windows(window, mesh_n))):
        frame_fn, state, a2, _p = fused_frame(
            plan, src, wb, classes, preplanned=(passes_b, a_b))
        state_k = jax.device_put(state, devices[k])
        eps_k = jax.device_put(jnp.float32(0), devices[k])
        img_b = frame_fn(state_k, eps_k)
        bad = np.argwhere(a_b == -1)
        if bad.size:
            if verbose:
                print(f"fastpath(mesh): band {k}: {len(bad)} tiles "
                      "via XLA fallback")
            src_k = state_k["src"]
            sx0, sy0, mask0, _z = _coords(geom, wb, "orig", src_k, 0,
                                          (0.0, 0.0),
                                          state_k["basis"])
            img_b = _patch_tiles_batch(
                img_b, src_k.spl.coeff, sx0, sy0, mask0,
                jax.device_put(_bad_origins(bad), devices[k]),
                src.spl.degree, plan.nchannels, src.static.brighten)
        outs.append(img_b)
    return _gather_bands(outs)


def _mesh_solo_twined(plan, src, window, mesh_n, devices, verbose,
                      classes):
    """Full-cover twined solo frame per output-row band (the 16K
    downscale config under --mesh)."""
    geom = _geom_static(plan)
    bias = 1.0 / ST.DERIV_BIAS
    spread = tuple((float(cx) * bias, float(cy) * bias, float(w))
                   for (cx, cy, w) in plan.spread)
    if classes is None:
        classes = select_classes(plan, src, window, spread=spread,
                                 verbose=verbose)
    passes, assigned = plan_passes(plan, src, window, classes,
                                   spread=spread)
    n_fast = int((assigned >= 0).sum())
    if n_fast == 0:
        return None
    if verbose:
        print(f"fastpath(mesh/twined): {n_fast}/{assigned.size} tiles"
              f" fused, {len(spread)} taps, {mesh_n} devices")
    bands = split_passes_by_bands(passes, assigned, mesh_n)
    outs = []
    for k, ((passes_b, a_b), wb) in enumerate(
            zip(bands, _band_windows(window, mesh_n))):
        frame_fn, state, _a, _p = fused_frame(
            plan, src, wb, classes, spread=spread,
            preplanned=(passes_b, a_b))
        state_k = jax.device_put(state, devices[k])
        eps_k = jax.device_put(jnp.float32(0), devices[k])
        img_b = frame_fn(state_k, eps_k)
        bad = np.argwhere(a_b == -1)
        if bad.size:
            if verbose:
                print(f"fastpath(mesh/twined): band {k}: {len(bad)} "
                      "tiles via XLA fallback")
            src_k = state_k["src"]
            basis = state_k["basis"]
            c0 = _coords(geom, wb, "orig", src_k, 0, (0.0, 0.0),
                         basis)
            c10 = _coords(geom, wb, "orig", src_k, 0,
                          (ST.DERIV_BIAS, 0.0), basis)
            c01 = _coords(geom, wb, "orig", src_k, 0,
                          (0.0, ST.DERIV_BIAS), basis)
            sx, sy, mask = c0[0], c0[1], c0[2]
            dux, dvx = _deriv(sx, c10[0], c01[0])
            duy, dvy = _deriv(sy, c10[1], c01[1])
            img_b = _patch_tiles_batch_twined(
                img_b, src_k.spl.coeff, sx, sy, dux, duy, dvx, dvy,
                mask, jax.device_put(_bad_origins(bad), devices[k]),
                src.spl.degree, spread, plan.nchannels,
                float(src.static.brighten))
        outs.append(img_b)
    return _gather_bands(outs)


def _mesh_solo_twined_partial(plan, src, window, mesh_n, devices,
                              verbose, classes):
    """Partial-facet twined solo frame per band: the core/band
    decomposition of _render_fast_solo_twined_partial with the global
    plan band-sliced; the facet-edge band tiles are patched per tap on
    their band's device."""
    from scipy import ndimage

    geom = _geom_static(plan)
    bias = 1.0 / ST.DERIV_BIAS
    spread = tuple((float(cx) * bias, float(cy) * bias, float(w))
                   for (cx, cy, w) in plan.spread)
    if classes is None:
        classes = select_classes(plan, src, window, spread=spread,
                                 verbose=verbose)
    ph = window[1] - window[0]
    pw = window[3] - window[2]
    nty, ntx = ph // PR.TILE_H, pw // PR.TILE_W
    basis = _basis_arg(plan, 0)
    c0 = _coords(geom, window, "orig", src, 0, (0.0, 0.0), basis)
    mask_np = np.asarray(c0[2], bool)
    rx = int(math.ceil(max(abs(c[0]) for c in plan.spread))) + 1
    ry = int(math.ceil(max(abs(c[1]) for c in plan.spread))) + 1
    size = (2 * ry + 1, 2 * rx + 1)
    m8 = mask_np.astype(np.uint8)
    core = ndimage.minimum_filter(m8, size=size, mode="constant",
                                  cval=0).astype(bool)
    reach = ndimage.maximum_filter(m8, size=size, mode="constant",
                                   cval=0).astype(bool)
    tview = lambda a: a.reshape(nty, PR.TILE_H, ntx, PR.TILE_W)
    core_t = tview(core).all(axis=(1, 3))
    band_t = tview(reach).any(axis=(1, 3)) & ~core_t

    passes, assigned = plan_passes(plan, src, window, classes,
                                   spread=spread, exclude=band_t)
    n_fast = int((assigned >= 0).sum())
    if n_fast == 0 and core_t.any():
        return None
    # champion-routed band tiles, planned once globally and
    # band-sliced like the core plan - same treatment per tile as the
    # single-device path (_render_fast_solo_twined_partial)
    band_plans = None
    # same linear-finish gate as _render_fast_solo_twined_partial:
    # band frames are summed post-finish, so no channel conversion
    if band_t.any() and plan.nchannels == src.spl.coeff.shape[-1] \
            and os.environ.get("ENVUTIL_NO_TAPSEL") != "1":
        passes_bt, assigned_bt = plan_passes(
            plan, src, window, classes, 0, spread, exclude=~band_t,
            want_union=True, no_sep=True)
        if int((assigned_bt >= 0).sum()):
            band_plans = split_passes_by_bands(passes_bt, assigned_bt,
                                               mesh_n)
    if verbose:
        n_tsel = 0 if band_plans is None \
            else int((assigned_bt >= 0).sum())
        print(f"fastpath(mesh/twined/partial): {n_fast}/"
              f"{assigned.size} tiles fused, {int(band_t.sum())} band"
              f" tiles ({n_tsel} champion-routed), {len(spread)} "
              f"taps, {mesh_n} devices")
    bands = split_passes_by_bands(passes, assigned, mesh_n)
    outs = []
    for k, ((passes_b, a_b), wb) in enumerate(
            zip(bands, _band_windows(window, mesh_n))):
        frame_fn, state, _a, _p = fused_frame(
            plan, src, wb, classes, spread=spread,
            preplanned=(passes_b, a_b))
        state_k = jax.device_put(state, devices[k])
        eps_k = jax.device_put(jnp.float32(0), devices[k])
        img_b = frame_fn(state_k, eps_k)
        ab_k = None
        if band_plans is not None:
            pb_k, ab_k = band_plans[k]
        bad = np.argwhere((a_b == -1) if ab_k is None
                          else ((a_b == -1) & (ab_k < 0)))
        tap_masks = None
        src_k = state_k["src"]
        basis_k = state_k["basis"]
        if bad.size or (ab_k is not None and (ab_k >= 0).any()):
            tap_masks = jnp.stack(
                [_tap_mask_score(geom, wb, src_k, 0,
                                 jnp.asarray([cx, cy], jnp.float32),
                                 basis_k)[0]
                 for (cx, cy, _w) in plan.spread])
        if ab_k is not None and (ab_k >= 0).any():
            frame_b, state_b, _ab, _pb = fused_frame(
                plan, src, wb, classes, spread=spread, tapsel=True,
                preplanned=(pb_k, ab_k))
            st_b = dict(jax.device_put(state_b, devices[k]))
            st_b["champ"] = jnp.where(tap_masks, 0,
                                      -1).astype(jnp.int32)
            img_b = img_b + frame_b(st_b, eps_k)
        if bad.size:
            cb0 = _coords(geom, wb, "orig", src_k, 0, (0.0, 0.0),
                          basis_k)
            c10 = _coords(geom, wb, "orig", src_k, 0,
                          (ST.DERIV_BIAS, 0.0), basis_k)
            c01 = _coords(geom, wb, "orig", src_k, 0,
                          (0.0, ST.DERIV_BIAS), basis_k)
            sx, sy = cb0[0], cb0[1]
            dux, dvx = _deriv(sx, c10[0], c01[0])
            duy, dvy = _deriv(sy, c10[1], c01[1])
            img_b = _patch_tiles_batch_twined_pertap(
                img_b, src_k.spl.coeff, sx, sy, dux, duy, dvx, dvy,
                tap_masks,
                jax.device_put(_bad_origins(bad), devices[k]),
                src.spl.degree, spread, plan.nchannels,
                float(src.static.brighten))
        outs.append(img_b)
    return _gather_bands(outs)


def _mesh_multi(plan, sources, window, mesh_n, devices, verbose,
                classes):
    """Untwined multi-facet stitch per band: every facet planned once
    globally, each band a one-jit combined frame (facet passes + XLA
    patches + synopsis) on its own device."""
    plans = []
    for fi, src in enumerate(sources):
        passes, assigned = plan_passes(plan, src, window, classes, fi)
        n_fast = int((assigned >= 0).sum())
        n_zero = int((assigned == ZERO_PASS).sum())
        if verbose:
            print(f"fastpath(mesh/multi): facet {fi}: {n_fast}/"
                  f"{assigned.size} tiles fused, {n_zero} empty")
        if n_fast == 0 and n_zero < assigned.size:
            return None
        plans.append((passes, assigned))
    band_lists = [split_passes_by_bands(p, a, mesh_n)
                  for (p, a) in plans]
    outs = []
    for k, wb in enumerate(_band_windows(window, mesh_n)):
        ppl = [band_lists[fi][k] for fi in range(len(sources))]
        fn, states, _a, _pl = fused_multi_frame(
            plan, sources, wb, classes, preplanned_list=ppl)
        states_k = jax.device_put(tuple(states), devices[k])
        eps_k = jax.device_put(jnp.float32(0), devices[k])
        outs.append(fn(states_k, eps_k))
    return _gather_bands(outs)


def _mesh_multi_pertap(plan, sources, window, mesh_n, devices,
                       verbose, classes):
    """Twined multi-facet stitch per band: champion stability and all
    pass plans computed once globally (_pertap_host_plan), band-sliced
    (_pertap_slice_band), one compiled per-tap frame per band."""
    S = _pertap_host_plan(plan, sources, window, classes, verbose)
    if S is None:
        return None
    if verbose:
        print(f"fastpath(mesh/pertap): {mesh_n} devices, "
              f"{len(S['spread'])} taps")
    outs = []
    for k, wb in enumerate(_band_windows(window, mesh_n)):
        Sb = _pertap_slice_band(S, k, mesh_n)
        fn, args = _pertap_build(plan, sources, wb, classes, Sb,
                                 verbose=False)
        args_k = jax.device_put(args, devices[k])
        outs.append(fn(*args_k))
    return _gather_bands(outs)


def _eligible_multi(plan, sources) -> bool:
    if jax.default_backend() == "cpu" and not PR.FORCE_INTERPRET:
        return False
    if plan.spread is not None and getattr(plan, "twine_precise",
                                           False):
        return False  # ray-space tangential basis: XLA path (see
        #               eligible())
    for src in sources:
        if src.static.kind == "paint" or src.static.masked != -1:
            return False
        if src.spl is None or src.spl.degree > 7:
            return False
    return True


def _combine_stack(plan, sources, px_list, mask_list, score_list):
    from ..models import synopsis as SYN

    if plan.synopsis == "hdr_merge":
        return SYN.hdr_merge_stack(px_list, [s.static.brighten
                                             for s in sources],
                                   plan.nchannels)
    px = jnp.stack(px_list)
    mask = jnp.stack(mask_list)
    score = jnp.stack(score_list)
    if plan.nchannels in (1, 3):
        return SYN.voronoi_stack(px, mask, score)
    return SYN.voronoi_plus_stack(px, mask, score)


def render_fast_multi(plan, sources, verbose: bool = False,
                      classes=DEFAULT_CLASSES
                      ) -> Optional[np.ndarray]:
    """Multi-facet render through the fused kernel: one fused frame
    per facet, then the synopsis combine (voronoi / voronoi+ /
    hdr_merge) on device. With twining this runs per tap, like the
    reference's synopsis_t (each tap blends champion facets with the
    tap's own deflected validity masks - that is what feathers facet
    seams, envutil_payload.cc:611-691)."""
    if not _eligible_multi(plan, sources):
        return None
    if plan.crop is not None:
        y0, y1, x0, x1 = plan.crop
    else:
        y0, y1, x0, x1 = 0, plan.height, 0, plan.width
    out_h, out_w = y1 - y0, x1 - x0
    ph = _round_up(out_h, PR.TILE_H)
    pw = _round_up(out_w, PR.TILE_W)
    window = (y0, y0 + ph, x0, x0 + pw)

    if plan.spread is not None:
        return _render_fast_multi_pertap(plan, sources, window,
                                         out_h, out_w, verbose,
                                         classes)

    # the whole stitch (frames + masks + scores + XLA patches +
    # synopsis) is one compiled program; decline only when a facet has
    # covered tiles but NO fused ones (an all-patch facet would run at
    # the ~100x-slower XLA scan rate - the graph path is better there)
    fn, states, assigneds, _pl = fused_multi_frame(plan, sources,
                                                   window, classes)
    for fi, a in enumerate(assigneds):
        n_fast = int((a >= 0).sum())
        n_zero = int((a == ZERO_PASS).sum())
        if verbose:
            n_bad = int((a == -1).sum())
            extra = f", {n_bad} via XLA patch" if n_bad else ""
            print(f"fastpath(multi): facet {fi}: "
                  f"{n_fast}/{a.size} tiles fused, "
                  f"{n_zero} empty{extra} (one-jit)")
        if n_fast == 0 and n_zero < a.size:
            return None  # one facet entirely unfusable: use XLA path
    out = fn(tuple(states), jnp.float32(0))
    img = np.array(jax.device_get(out), np.float32)
    return img[:out_h, :out_w]


def _pertap_host_plan(plan, sources, window, classes,
                      verbose: bool = False):
    """Global host-side planning for the twined multi-facet fused
    render (see fused_pertap_frame): the champion-stability analysis
    plus every facet's stable-tile and per-tap pass plans over the
    full ``window``. Returns None when a facet is entirely unfusable
    (callers fall back to the XLA graph path), else a dict of plain
    host data - np arrays and (passes, assigned) pairs - that
    _pertap_build turns into the compiled frame, either whole or
    band-sliced for --mesh (split_passes_by_bands keeps every tile's
    treatment identical on any band decomposition)."""
    y0, _y1, x0, _x1 = window
    ph = window[1] - y0
    pw = window[3] - x0
    nty, ntx = ph // PR.TILE_H, pw // PR.TILE_W
    geom = _geom_static(plan)
    bias = 1.0 / ST.DERIV_BIAS
    spread = tuple((float(cx) * bias, float(cy) * bias, float(w))
                   for (cx, cy, w) in plan.spread)

    # --- champion stability: stable_of[t] = champion facet of tile t
    # if the synopsis is tap-invariant there, else -1. The per-pixel
    # erosion/dilation and the tile reduction run on device (one
    # dispatch, (F+1, nty, ntx) bools fetched) - full mask/score
    # planes never cross the tunnel.
    stable_of = np.full((nty, ntx), -1, np.int32)
    unstable_t = np.ones((nty, ntx), bool)
    if plan.synopsis != "hdr_merge" and plan.nchannels in (1, 3) \
            and len(spread) > 1 and len(sources) > 1:
        rx = int(math.ceil(max(abs(c[0]) for c in plan.spread))) + 1
        ry = int(math.ceil(max(abs(c[1]) for c in plan.spread))) + 1
        stable_f, reach_t = _stability_tiles(
            geom, window, tuple(sources),
            tuple(_basis_arg(plan, fi) for fi in range(len(sources))),
            (2 * ry + 1, 2 * rx + 1))
        stable_f = np.asarray(stable_f, bool)
        reach_t = np.asarray(reach_t, bool)
        for fi in range(len(sources)):
            stable_of[stable_f[fi]] = fi
        unstable_t = (stable_of < 0) & reach_t
    stable_any_t = stable_of >= 0
    decomposed = bool(stable_any_t.any())

    stable = []  # (fi, passes, assigned) for facets owning stable tiles
    if decomposed:
        for fi, src in enumerate(sources):
            sel = stable_of == fi
            if not sel.any():
                continue
            passes_f, assigned_f = plan_passes(
                plan, src, window, classes, fi, spread, exclude=~sel)
            if verbose:
                print(f"fastpath(multi/pertap): facet {fi}: "
                      f"{int(sel.sum())} stable tiles "
                      f"({(assigned_f >= 0).sum()} fused, "
                      f"{int(((assigned_f == -1) & sel).sum())} via "
                      "XLA)")
            stable.append((fi, passes_f, assigned_f))

    # --- champion-routed seam band (tapsel): for voronoi synopses the
    # per-tap combine regroups facet-major - out = sum_f sum_k
    # w_k * [champ_k == f] * v_{f,k} - so each facet's band tiles run
    # ONE union-tap kernel instance with per-pixel tap weights from a
    # champion-id stack instead of K per-tap frames (the K-fold band
    # cost cut; the reference evaluates the same sum tap-major through
    # synopsis_t, envutil_payload.cc:611-691). Tiles any facet cannot
    # admit under union-tap classes stay on the exact per-tap loop
    # (old_t). Sec-variant (cubemap-source) facets carry face-dominance
    # merge masks the tapsel kernel does not model: any such facet
    # disables the decomposition for the frame.
    tapsel_ok = (plan.synopsis != "hdr_merge"
                 and plan.nchannels in (1, 3) and len(spread) > 1
                 and len(sources) > 1
                 and os.environ.get("ENVUTIL_NO_TAPSEL") != "1"
                 and not any(n.startswith("sec")
                             for src in sources
                             for n in _variant_names(src)))
    tapsel = []   # (fi, passes, assigned) champion-routed band frames
    old_t = unstable_t
    if tapsel_ok:
        band_plans = []
        old_t = np.zeros_like(unstable_t)
        for fi, src in enumerate(sources):
            passes_f, assigned_f = plan_passes(
                plan, src, window, classes, fi, spread,
                exclude=~unstable_t, want_union=True, no_sep=True)
            band_plans.append((passes_f, assigned_f))
            old_t = old_t | ((assigned_f == -1) & unstable_t)
        for fi, src in enumerate(sources):
            passes_f, assigned_f = band_plans[fi]
            if old_t.any():
                # a tile any facet busts goes whole to the per-tap
                # loop (its pixels need every facet's value under the
                # exact combine); replan the rest
                passes_f, assigned_f = plan_passes(
                    plan, src, window, classes, fi, spread,
                    exclude=~(unstable_t & ~old_t), want_union=True,
                    no_sep=True)
            n_fast = int((assigned_f >= 0).sum())
            if n_fast:
                tapsel.append((fi, passes_f, assigned_f))
            if verbose:
                print(f"fastpath(multi/tapsel): facet {fi}: "
                      f"{n_fast} champion-routed band tiles")
        if verbose and old_t.any():
            print(f"fastpath(multi/tapsel): {int(old_t.sum())} band "
                  "tiles stay on the per-tap loop")

    pertap = []  # one (passes, assigned) per facet (tap-loop frames)
    for fi, src in enumerate(sources):
        passes_f, assigned_f = plan_passes(
            plan, src, window, classes, fi, spread,
            exclude=(~old_t if tapsel_ok else
                     (stable_any_t if decomposed else None)),
            want_union=False)
        n_fast = int((assigned_f >= 0).sum())
        n_zero = int((assigned_f == ZERO_PASS).sum())
        unf = int(((assigned_f == -1) & old_t).sum())
        if verbose:
            print(f"fastpath(multi/pertap): facet {fi}: {n_fast}/"
                  f"{assigned_f.size} tiles fused, {n_zero} empty")
        has_tapsel = any(tfi == fi for (tfi, _p, _a) in tapsel)
        if n_fast == 0 and unf > 0 \
                and n_zero < assigned_f.size \
                and not (stable_of == fi).any() \
                and not has_tapsel:
            # one facet entirely unfusable (champion routing serves
            # none of its tiles either): decline to the XLA graph
            # path rather than run its band through the ~100x-slower
            # in-jit scan patcher
            return None
        if verbose and unf:
            print(f"fastpath(multi/pertap): facet {fi}: "
                  f"{unf} tiles via XLA fallback")
        pertap.append((passes_f, assigned_f))
    return dict(spread=spread, stable_of=stable_of,
                unstable_t=unstable_t, stable=stable, pertap=pertap,
                tapsel=tapsel, old_t=old_t)


def _pertap_slice_band(S, k: int, n_bands: int):
    """Band ``k`` of a _pertap_host_plan structure: every pass plan
    sliced with split_passes_by_bands (treatment-preserving), the
    stability grids row-sliced."""
    nty = S["stable_of"].shape[0]
    bh = nty // n_bands
    sl = slice(k * bh, (k + 1) * bh)
    stable = []
    for (fi, passes_f, assigned_f) in S["stable"]:
        pb, ab = split_passes_by_bands(passes_f, assigned_f,
                                       n_bands)[k]
        if not ((S["stable_of"][sl] == fi).any()):
            continue
        stable.append((fi, pb, ab))
    tapsel = []
    for (fi, passes_f, assigned_f) in S["tapsel"]:
        pb, ab = split_passes_by_bands(passes_f, assigned_f,
                                       n_bands)[k]
        if int((ab >= 0).sum()):
            tapsel.append((fi, pb, ab))
    pertap = [split_passes_by_bands(p, a, n_bands)[k]
              for (p, a) in S["pertap"]]
    return dict(spread=S["spread"], stable_of=S["stable_of"][sl],
                unstable_t=S["unstable_t"][sl], stable=stable,
                pertap=pertap, tapsel=tapsel, old_t=S["old_t"][sl])


def fused_pertap_frame(plan, sources, window, verbose: bool = False,
                       classes=DEFAULT_CLASSES):
    """Twined multi-facet fused render with exact per-tap synopsis
    semantics: for every twining tap, each facet renders one
    deflected single-tap frame through the kernel (classified once
    against the full tap footprint, so the compiled program is shared
    by all taps - the tap coefficients are traced), masks and scores
    come from the tap-deflected rays (_tap_mask_score), the synopsis
    combines the facets, and the weighted taps accumulate. This is
    the reference's synopsis_t wrapper (envutil_payload.cc:587-691)
    at kernel granularity; the per-tap masks are what blend facet
    seams under the twining filter. The tap score uses the deflected
    ray's z (exact); the per-tap kernel work equals the per-facet
    composed variant's, the extra cost is K synopsis combines.

    The whole K-tap x F-facet pipeline runs as ONE compiled program:
    the tap loop is a lax.fori_loop whose body reads its (cx, cy, w)
    from a traced (K, 3) spread array, so K x F frame/mask/patch
    dispatches (20-30 ms each through the remote device tunnel)
    collapse into a single dispatch, and the tap-invariant coordinate
    passes for the XLA-patched tiles are hoisted out of the loop.

    Champion-stability decomposition (voronoi synopses): the per-tap
    loop is only *necessary* where the synopsis outcome can change
    across the spread. A tap at offset (cx, cy) sees the champion
    field at output position (x+cx, y+cy) (first-order ninepack
    deflection), so a tile whose ceil(max|c|)+1-dilated neighbourhood
    is championed by ONE facet with full validity yields, for every
    tap, that facet's own twined sample - i.e. the facet's plain
    fused twined frame (union-tap classes, K-independent gathers).
    Such 'stable' tiles run once through their champion's solo twined
    passes; only the seam/edge band pays the K-tap loop. The stable
    analysis runs on center masks/scores (host); its erosion radius
    covers the deflection reach exactly like the solo partial path.

    Returns ``(fn, args)`` with ``fn(*args)`` the one-jit padded-frame
    program, or None when a facet is entirely unfusable (callers fall
    back to the XLA graph path)."""
    S = _pertap_host_plan(plan, sources, window, classes, verbose)
    if S is None:
        return None
    return _pertap_build(plan, sources, window, classes, S, verbose)


def _pertap_build(plan, sources, window, classes, S,
                  verbose: bool = False):
    """Compile the one-jit per-tap frame over ``window`` from a
    (possibly band-sliced) _pertap_host_plan structure."""
    ph = window[1] - window[0]
    pw = window[3] - window[2]
    geom = _geom_static(plan)
    spread = S["spread"]
    stable_of = S["stable_of"]
    unstable_t = S["unstable_t"]
    decomposed = bool((stable_of >= 0).any())

    # --- solo twined frames for the stable tiles (one per owning
    # facet, union-tap classes; traced together with the tap loop)
    stable_frames = []  # (fi, frame, bad_tuple, degree, brighten, key)
    stable_states = []
    for (fi, passes_f, assigned_f) in S["stable"]:
        src = sources[fi]
        frame, st, assigned, passes, key, _cs = _frame_builder(
            plan, src, window, classes, fi=fi, spread=spread,
            preplanned=(passes_f, assigned_f))
        badf = tuple(map(tuple, np.argwhere(
            (assigned_f == -1) & (stable_of == fi))))
        stable_frames.append((fi, frame, badf, src.spl.degree,
                              float(src.static.brighten), key))
        stable_states.append(st)

    old_t = S["old_t"]

    # champion-routed band frames (one union-tap frame per facet with
    # per-pixel tap weights; see _pertap_host_plan)
    tapsel_frames = []  # (fi, frame, key)
    tapsel_states = []
    for (fi, passes_f, assigned_f) in S["tapsel"]:
        src = sources[fi]
        frame, st, assigned, passes, key, _cs = _frame_builder(
            plan, src, window, classes, fi=fi, spread=spread,
            tapsel=True, preplanned=(passes_f, assigned_f))
        tapsel_frames.append((fi, frame, key))
        tapsel_states.append(st)

    per_facet = []
    states = []
    keys = []
    part = []  # facet indices participating in the tap loop
    for fi, src in enumerate(sources):
        passes_f, assigned_f = S["pertap"][fi]
        frame_fn, state, assigned, passes, key, _cs = _frame_builder(
            plan, src, window, classes, fi=fi, spread=spread,
            pertap=True, preplanned=(passes_f, assigned_f))
        n_fast = int((assigned_f >= 0).sum())
        bad = tuple(map(tuple, np.argwhere(
            (assigned_f == -1) & old_t)))
        per_facet.append((frame_fn, n_fast, bad, src.spl.degree,
                          float(src.static.brighten)))
        states.append(state)
        keys.append(key)
        if n_fast > 0 or bad:
            part.append(fi)

    statics = tuple(src.static for src in sources)
    n_taps = len(spread)
    run_taps = (bool(part) and bool(old_t.any())
                or not (decomposed or tapsel_frames))

    def combined(sts, ssts, tsts, sp, old_px):
        derivs = {}

        def facet_derivs(fi, basis):
            if fi not in derivs:
                c0 = _coords(geom, window, "orig", sts[fi]["src"],
                             fi, (0.0, 0.0), basis)
                c10 = _coords(geom, window, "orig", sts[fi]["src"],
                              fi, (ST.DERIV_BIAS, 0.0), basis)
                c01 = _coords(geom, window, "orig", sts[fi]["src"],
                              fi, (0.0, ST.DERIV_BIAS), basis)
                dux, dvx = _deriv(c0[0], c10[0], c01[0])
                duy, dvy = _deriv(c0[1], c10[1], c01[1])
                derivs[fi] = (c0[0], c0[1], dux, duy, dvx, dvy)
            return derivs[fi]

        # stable tiles: each champion facet's plain twined frame
        out = jnp.zeros((ph, pw, plan.nchannels), jnp.float32)
        for si, (fi, frame, badf, degree, brighten, _k) in \
                enumerate(stable_frames):
            img_f = frame(ssts[si], jnp.float32(0))
            if badf:
                sx0, sy0, dux, duy, dvx, dvy = facet_derivs(
                    fi, sts[fi]["basis"])
                img_f = _patch_tiles_batch_twined(
                    img_f, sts[fi]["src"].spl.coeff, sx0, sy0, dux,
                    duy, dvx, dvy, None,
                    _bad_origins(np.asarray(badf)), degree, spread,
                    plan.nchannels, brighten, use_mask=False)
            out = out + img_f  # disjoint tile support

        # champion-routed band frames: the (n_taps, ph, pw) champion-
        # id stack (voronoi winner over ALL facets per tap, -1 where
        # no facet is valid) is computed once inside the jit; each
        # tapsel frame compares it against its facet id per pixel, so
        # the facet-major regrouped band sum needs one union-tap
        # frame per facet (disjoint tile support across facets'
        # contributions is NOT required - the weights partition
        # pixels per tap, and the facet sums overlap-add exactly)
        if tapsel_frames:
            def champ_body(k, buf):
                b = jnp.stack([sp[k, 0] * ST.DERIV_BIAS,
                               sp[k, 1] * ST.DERIV_BIAS])
                ms, scs = [], []
                for fj in range(len(sources)):
                    m, sc = _tap_mask_score(geom, window,
                                            sts[fj]["src"], fj, b,
                                            sts[fj]["basis"])
                    ms.append(m)
                    scs.append(sc)
                ch = jnp.argmax(jnp.stack(scs),
                                axis=0).astype(jnp.int32)
                ch = jnp.where(jnp.stack(ms).any(axis=0), ch, -1)
                return jax.lax.dynamic_update_slice(
                    buf, ch[None], (k, 0, 0))

            champ = jax.lax.fori_loop(
                0, n_taps, champ_body,
                jnp.zeros((n_taps, ph, pw), jnp.int32))
            for si, (fi, frame, _k) in enumerate(tapsel_frames):
                st_t = dict(tsts[si])
                st_t["champ"] = champ
                out = out + frame(st_t, jnp.float32(0))

        if not run_taps:
            return out

        # tap-invariant work hoisted out of the tap loop: undeflected
        # coordinates + derivatives for the XLA-patched tiles
        for fi in part:
            if per_facet[fi][2]:
                facet_derivs(fi, sts[fi]["basis"])

        def tap_body(k, acc):
            cx, cy, w = sp[k, 0], sp[k, 1], sp[k, 2]
            px_list, mask_list, score_list = [], [], []
            for fi in part:
                frame_fn, n_fast, bad, degree, brighten = \
                    per_facet[fi]
                mask, score = _tap_mask_score(
                    geom, window, sts[fi]["src"], fi,
                    jnp.stack([cx * ST.DERIV_BIAS,
                               cy * ST.DERIV_BIAS]),
                    sts[fi]["basis"])
                st_k = dict(sts[fi])
                st_k["spread"] = jnp.stack([cx, cy,
                                            jnp.float32(1.0)])
                st_k["tap_mask"] = mask.astype(jnp.float32)
                if n_fast:
                    img_f = frame_fn(st_k, jnp.float32(0))
                else:
                    img_f = jnp.zeros((ph, pw, plan.nchannels),
                                      jnp.float32)
                if bad:
                    sx0, sy0, dux, duy, dvx, dvy = derivs[fi]
                    img_f = _patch_tiles_batch_tap(
                        img_f, sts[fi]["src"].spl.coeff, sx0, sy0,
                        dux, duy, dvx, dvy,
                        _bad_origins(np.asarray(bad)), degree,
                        jnp.stack([cx, cy]), plan.nchannels,
                        brighten)
                img_f = jnp.where(mask[..., None], img_f, 0.0)
                px_list.append(img_f)
                mask_list.append(mask)
                score_list.append(score)
            tap_img = _combine_stack(plan,
                                     [sources[fi] for fi in part],
                                     px_list, mask_list, score_list)
            return acc + w * tap_img

        acc0 = jnp.zeros((ph, pw, plan.nchannels), jnp.float32)
        acc = jax.lax.fori_loop(0, n_taps, tap_body, acc0)
        if not (decomposed or tapsel_frames):
            return acc
        return out + jnp.where(old_px[..., None] > 0.5, acc, 0.0)

    mkey = (tuple(keys), plan.synopsis, plan.nchannels, n_taps,
            tuple(float(s.recip_step) for s in statics),
            tuple(pf[1:] for pf in per_facet), tuple(part),
            tuple(sf[0] for sf in stable_frames),
            tuple(sf[2:] for sf in stable_frames), decomposed,
            run_taps, tuple(tf[0] for tf in tapsel_frames),
            tuple(tf[2] for tf in tapsel_frames))
    fn = _PERTAP_CACHE.get(mkey)
    if fn is None:
        fn = _PERTAP_CACHE[mkey] = jax.jit(combined)
    spread_arr = jnp.asarray(np.asarray(spread, np.float32))
    old_px = jnp.asarray(np.repeat(np.repeat(
        old_t.astype(np.float32), PR.TILE_H, 0), PR.TILE_W, 1))
    return fn, (tuple(states), tuple(stable_states),
                tuple(tapsel_states), spread_arr, old_px)


def _render_fast_multi_pertap(plan, sources, window, out_h, out_w,
                              verbose: bool, classes
                              ) -> Optional[np.ndarray]:
    got = fused_pertap_frame(plan, sources, window, verbose, classes)
    if got is None:
        return None
    fn, args = got
    acc = fn(*args)
    img = np.array(jax.device_get(acc), np.float32)
    return img[:out_h, :out_w]
