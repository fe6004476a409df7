"""Fused windowed b-spline resampling kernel (Pallas / Mosaic TPU).

This is the framework's hot op - the equivalent of the reference's
per-pixel b-spline gather (zimt/eval.h) running inside zimt::process's
tile decomposition (zimt/wielding.h). XLA's gather lowers to ~70M
random elements/s on TPU, ~100x below memory bandwidth; this kernel
composes the only gather the hardware offers - the single-vreg (8, 128)
``tpu.dynamic_gather`` (per-lane sublane shuffle / per-sublane lane
shuffle) - into an *exact* tensor-product spline evaluation.

The composition pitfall: chaining two dynamic_gathers yields
``win[y[s, x[s,l]], x[s,l]]``, not ``win[y[s,l], x[s,l]]`` - the second
gather reads entries the first built for other pixels. The fix used
here: resolve the *column* axis first with a **sublane-constant column
field**. Per output lane l, all 8 sublanes share a tap-column base
``bxc[l] = min_s bx[s,l]``; horizontal taps run over an extended static
range kappa = 0..K-1 of columns ``bxc+kappa`` whose per-pixel weights
are the b-spline basis evaluated at the true distance
``B(sx - (bxc+kappa))`` (zero outside the support, so the sum is the
exact deg+1-tap interpolation). Because the column index is
sublane-constant, the subsequent per-element row resolve
(axis-0 gather by ``by + j`` over candidate row-blocks) is consistent.

The output raster is tiled (128x128); each tile's source support is a
compact window whose origin is scalar-prefetched and DMA'd HBM->VMEM.
Tiles whose per-vreg footprints exceed the static class budgets
(cand_r row-blocks, cand_c lane-blocks, K tap columns) - pole cores,
seams, extreme rotations - are classified at plan time and fall back
to the XLA path.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import basis as _basis

# ENVUTIL_INTERPRET=1 forces every kernel into Pallas interpreter mode
# (and fastpath.eligible() then admits the CPU backend), so the whole
# fused product path can be driven end-to-end without TPU hardware.
FORCE_INTERPRET = os.environ.get("ENVUTIL_INTERPRET") == "1"

TILE_H = 128
TILE_W = 128

# compact-grid tile rows: (in_by, in_bx, out_by, out_bx, oy, ox) plus,
# in the extended form, per-row-block candidate origins (rb0, cb0) x
# NRB precomputed by the pass planner (kills the in-kernel scalar
# reductions on the gather-address critical path); sheared classes
# ship (rb0, cb0, a_fix, b_fix) x NRB instead (fixed-point linear
# shear fit, a in 1/256 rows, b in 1/65536 rows/column)
NRB = TILE_H // 8
TILE_ROW_INTS = 6
TILE_ROW_INTS_EXT = TILE_ROW_INTS + 2 * NRB
TILE_ROW_INTS_SHEAR = TILE_ROW_INTS + 4 * NRB
A_FIX = 256          # fixed-point scale of the shear intercept
B_FIX = 65536        # fixed-point scale of the shear slope


@dataclasses.dataclass(frozen=True)
class WindowClass:
    """Static per-tile source-window geometry and per-vreg budgets.

    ``shear_q > 0`` selects the *sheared-window* evaluation: per
    (8, 128) output row-block the classifier fits a linear shear
    ``S(c) = a + b*c`` (source row as a function of source column) and
    the kernel materializes ``shear_q`` 8-row *sheared bands*
    ``band[q][s, c] = win[S(c) + 8q + s, c]`` once - paying the
    ``cand_r`` row-candidate cascade per band instead of per
    (tap, channel). Because the shear is a function of the source
    column, it commutes with the sublane-constant column gather, so
    the subsequent per-element row resolve only spans the small *fit
    residual* (``8*shear_q`` rows) instead of the raw row span. This
    cuts the gather count (the kernel's bottleneck: the VPU resolves
    one (8,128) dynamic_gather per cycle) by ~2-3x on diagonal warps."""
    win_h: int      # multiple of 8
    win_w: int      # multiple of 128
    cand_r: int     # candidate row-blocks of 8 per vreg
    cand_c: int     # candidate lane-blocks of 128 per vreg
    k_taps: int     # horizontal tap columns per pixel lane
    shear_q: int = 0  # sheared bands of 8 rows (0 = unsheared)
    # union-tap evaluation (twined kernels only): gather the column
    # resolve and n1 + u_span candidate rows ONCE per tap column and
    # route every twining tap through VPU selects, instead of paying
    # the full gather chain per tap. Admissible when every pixel's
    # K-tap row footprint (floor(sy+my) - floor(sy-my)) fits u_span
    # rows - the column side is already covered by the k_taps drift
    # budget, which tile_stats_range computes over the full footprint.
    u_span: int = 0
    # separable tensor-grid routing (union-tap kernels only): when the
    # spread is a full kx x ky grid AND the tile's dvx is identically
    # zero (no cross-coupling of the y deflection into the x
    # coordinate - axis-aligned warps like the 16K downscale), the
    # horizontal tap routing depends only on the grid COLUMN, so it is
    # computed kx times instead of kx*ky, and the per-tap rank-1
    # weight update collapses to one outer product per column
    # (_union_sep_weights). Admission: per-vreg all(dvx == 0), stat 10
    # of tile_stats_fit_range.
    sep: bool = False
    # ladder provenance: the module-level constant this class (or a
    # pass-fitted shrink of it, fastpath._fitted_class) descends from.
    # Excluded from eq/hash so fitted clones stay value-comparable.
    label: str = dataclasses.field(default="", compare=False)

    @property
    def name(self):
        s = f"q{self.shear_q}" if self.shear_q else ""
        u = f"u{self.u_span}" if self.u_span else ""
        g = "s" if self.sep else ""
        return (f"w{self.win_h}x{self.win_w}r{self.cand_r}"
                f"c{self.cand_c}k{self.k_taps}{s}{u}{g}")


# general local warps (|dy/dx_out| up to ~0.4, sublane x-drift <= 4)
LOCAL = WindowClass(win_h=384, win_w=512, cand_r=8, cand_c=3, k_taps=8)
# near-axis-aligned, near-unit-scale tiles (e.g. cube-face centers):
# minimal candidate budgets, ~2x cheaper per tile than ALIGNED
TIGHT = WindowClass(win_h=192, win_w=384, cand_r=3, cand_c=2, k_taps=5)
# gentler warps (axis-aligned reprojections): smaller budgets, faster
ALIGNED = WindowClass(win_h=256, win_w=384, cand_r=4, cand_c=2, k_taps=6)
# low-drift tiles with moderate lane-direction y variation (gnomonic
# curvature): same window as TIGHT, more candidate row-blocks
ROWS4 = WindowClass(win_h=192, win_w=384, cand_r=4, cand_c=2, k_taps=5)
ROWS6 = WindowClass(win_h=256, win_w=384, cand_r=6, cand_c=2, k_taps=5)
# axis-aligned but wider-than-vreg x footprints (unit-to-1.5x scales,
# e.g. cube-face centers): three lane-blocks, small row budget
MID = WindowClass(win_h=256, win_w=512, cand_r=4, cand_c=3, k_taps=6)
# minification (output coarser than source, up to ~4x): wide lane
# footprints at low drift - e.g. panorama stitches from higher-res
# facets, --single re-creations at reduced size
MINIFY = WindowClass(win_h=512, win_w=896, cand_r=8, cand_c=6, k_taps=6)
# diagonal warps (e.g. 90-degree-pitched equirect re-parametrization):
# ~8x the per-tile cost, used for per-asset preprocessing builds
DIAG = WindowClass(win_h=512, win_w=512, cand_r=17, cand_c=3, k_taps=16)
# steep minified corners (low drift, huge row span + curvature):
# higher-res facets stitched into a pano swing wildly near their
# corners; single-buffered window (6.6MB), used for a handful of tiles
STEEP = WindowClass(win_h=640, win_w=896, cand_r=22, cand_c=4,
                    k_taps=6)

# sheared siblings: same windows/coverage budgets as the classes they
# shadow, plus the residual-fits-in-8*Q criterion; admitted tiles cost
# ~1.5-4x less (fewer gathers), so the planner tries these first.
# (q=1 variants were tried and are useless: the 8*Q band rows must
# physically cover the vreg's intrinsic ~1-row-per-sublane advance
# (~7 rows at unit scale) on top of the fit residual, so a single
# 8-row band only ever fits strong vertical minification)
SHEAR4 = WindowClass(win_h=192, win_w=384, cand_r=4, cand_c=2,
                     k_taps=5, shear_q=2)
SHEAR6 = WindowClass(win_h=256, win_w=384, cand_r=6, cand_c=2,
                     k_taps=5, shear_q=2)
SHEAR6_3 = WindowClass(win_h=256, win_w=384, cand_r=6, cand_c=2,
                       k_taps=5, shear_q=3)
SHEAR_MID = WindowClass(win_h=256, win_w=512, cand_r=4, cand_c=3,
                        k_taps=6, shear_q=2)
SHEAR_LOCAL = WindowClass(win_h=384, win_w=512, cand_r=8, cand_c=3,
                          k_taps=8, shear_q=2)
SHEAR_LOCAL_3 = WindowClass(win_h=384, win_w=512, cand_r=8, cand_c=3,
                            k_taps=8, shear_q=3)
SHEAR_MINIFY = WindowClass(win_h=512, win_w=896, cand_r=8, cand_c=6,
                           k_taps=6, shear_q=2)
# deeper-band sheared variants: the twined classifier widens the band
# requirement by the tap-margin slack (tile_stats_fit_range), which
# busts q2/q3 for minified twined tiles - q3/q4 bands admit them and
# replace the cand_r-deep row cascades with Q-deep band resolves
# (~1.6-2x fewer gathers on the 16K 16-tap tiles)
SHEAR_MINIFY_3 = WindowClass(win_h=512, win_w=896, cand_r=8, cand_c=6,
                             k_taps=6, shear_q=3)
SHEAR_STEEP = WindowClass(win_h=640, win_w=896, cand_r=22, cand_c=4,
                          k_taps=6, shear_q=4)
SHEAR_DIAG = WindowClass(win_h=512, win_w=512, cand_r=17, cand_c=3,
                         k_taps=16, shear_q=3)

for _cname in ("LOCAL", "TIGHT", "ALIGNED", "ROWS4", "ROWS6", "MID",
               "MINIFY", "DIAG", "STEEP", "SHEAR4", "SHEAR6",
               "SHEAR6_3", "SHEAR_MID", "SHEAR_LOCAL", "SHEAR_LOCAL_3",
               "SHEAR_MINIFY", "SHEAR_MINIFY_3", "SHEAR_STEEP",
               "SHEAR_DIAG"):
    object.__setattr__(globals()[_cname], "label", _cname)
del _cname


def aligned_dims(hp: int, wp: int, wc: WindowClass) -> tuple[int, int]:
    """Coefficient-array dims after alignment padding: at least one
    window, rows a multiple of 8, cols a multiple of 128, so that all
    clipped window origins stay aligned."""
    ha = max(wc.win_h, ((hp + 7) // 8) * 8)
    wa = max(wc.win_w, ((wp + 127) // 128) * 128)
    return ha, wa


def _weights_poly(t, degree):
    m = _basis.weight_matrix(degree)
    ws = []
    for j in range(degree + 1):
        acc = jnp.full_like(t, float(m[j, degree]))
        for k in range(degree - 1, -1, -1):
            acc = acc * t + float(m[j, k])
        ws.append(acc)
    return ws


def _split(c, degree):
    if degree % 2:
        sel = jnp.floor(c)
    else:
        sel = jnp.floor(c + 0.5)
    return sel.astype(jnp.int32), c - sel


def _eval_row_block(sx, sy, win_ref, *, degree: int, wc: WindowClass,
                    nch: int, rb0=None, cb0=None):
    """Evaluate the exact tensor-product spline for one (8, TILE_W)
    vreg row-block. ``sx``/``sy`` are window-relative continuous
    coordinates; ``win_ref`` is the (nch, win_h, win_w) VMEM window.
    Returns the per-channel list of (8, TILE_W) value vregs.

    ``rb0``/``cb0`` are the candidate-block origins. When None they
    are derived in-kernel by cross-lane min reductions - a full
    vreg-to-scalar reduce whose result feeds every gather address, a
    long serial dependency worth ~half the row-block's cycles. The
    production path precomputes them host-side from the classifier's
    per-vreg tile statistics and ships them through scalar prefetch."""
    n1 = degree + 1
    off = degree // 2

    # vertical: per-element base + exact split weights
    sely, ty = _split(sy, degree)
    by = sely - off
    if rb0 is None:
        rb_min = jnp.min(by)
        rb0 = jnp.clip((rb_min // 8) * 8, 0, wc.win_h - 8 * wc.cand_r)
        rb0 = pl.multiple_of(rb0, 8)
    ly = jnp.clip(by - rb0, 0, 8 * wc.cand_r - 1 - degree)
    wy = _weights_poly(ty, degree)

    # horizontal: sublane-constant tap base per lane
    selx, tx = _split(sx, degree)
    bx = selx - off
    bxc = jnp.broadcast_to(jnp.min(bx, axis=0, keepdims=True),
                           (8, TILE_W))
    if cb0 is None:
        cb_min = jnp.min(bxc)
        cb0 = jnp.clip((cb_min // 128) * 128, 0,
                       wc.win_w - 128 * wc.cand_c)
        cb0 = pl.multiple_of(cb0, 128)
    lxc = jnp.clip(bxc - cb0, 0, 128 * wc.cand_c - 1)

    # per-(kappa) horizontal weights: tap bxc+kappa serves pixel
    # column bx+j exactly when kappa == delta+j (delta = bx-bxc,
    # the sublane drift), so the exact tap weight is the Horner
    # spline weight w_j(tx) routed by a delta select - same values
    # as evaluating the basis at the true distance, much cheaper
    delta = bx - bxc
    wx = _weights_poly(tx, degree)
    wk = []
    for k in range(wc.k_taps):
        acc_w = None
        for j in range(n1):
            if k - j < 0:
                continue
            hit = delta == (k - j)
            acc_w = jnp.where(hit, wx[j],
                              0.0 if acc_w is None else acc_w)
        wk.append(acc_w if acc_w is not None
                  else jnp.zeros((8, TILE_W), jnp.float32))
    # combined (j, kappa) weights, shared across channels
    wjk = [[wy[j] * wk[k] for k in range(wc.k_taps)]
           for j in range(n1)]

    rr = [(ly + j) & 7 for j in range(n1)]
    qb = [(ly + j) >> 3 for j in range(n1)]

    # per-kappa column index fields, shared across channels
    qcs, rcs = [], []
    for k in range(wc.k_taps):
        cx = jnp.minimum(lxc + k, 128 * wc.cand_c - 1)
        qcs.append(cx >> 7)
        rcs.append(cx & 127)

    accs = []
    for ch in range(nch):
        blocks = [
            [win_ref[ch, pl.ds(rb0 + 8 * b, 8),
                     pl.ds(cb0 + 128 * cc, 128)]
             for cc in range(wc.cand_c)]
            for b in range(wc.cand_r)
        ]
        acc = jnp.zeros((8, TILE_W), jnp.float32)
        for k in range(wc.k_taps):
            qc = qcs[k]
            rc = rcs[k]
            # column-resolved raw rows, all candidate row-blocks
            tb = []
            for b in range(wc.cand_r):
                v = jnp.take_along_axis(blocks[b][0], rc, axis=1)
                for cc in range(1, wc.cand_c):
                    g = jnp.take_along_axis(blocks[b][cc], rc,
                                            axis=1)
                    v = jnp.where(qc == cc, g, v)
                tb.append(v)
            # per-element row resolve for each vertical tap
            for j in range(n1):
                v = jnp.take_along_axis(tb[0], rr[j], axis=0)
                for b in range(1, wc.cand_r):
                    g = jnp.take_along_axis(tb[b], rr[j], axis=0)
                    v = jnp.where(qb[j] == b, g, v)
                acc = acc + wjk[j][k] * v
        accs.append(acc)
    return accs


def _shear_bands(win_ref, *, degree: int, wc: WindowClass, nch: int,
                 rb0, cb0, a_fix, b_fix, col0):
    """Build the sheared 8-row bands for one row-block:
    ``band[ch][q][cc][s, l] = win[S(colb + 128cc + l) + 8q + s,
    cb0 + 128cc + l]`` with ``S(c) = floor(a + b*c)`` - paying the
    cand_r candidate cascade once per (band, lane-block) instead of
    per (tap, channel). The bands are tap-invariant, so the twined
    kernel amortizes one build over all K twining taps. Returns
    (bands, a_f, b_f)."""
    Q = wc.shear_q
    a_f = a_fix.astype(jnp.float32) * (1.0 / A_FIX)
    b_f = b_fix.astype(jnp.float32) * (1.0 / B_FIX)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 1)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 0)
    colb = col0 + cb0  # absolute column of candidate-block origin

    bands = [[[None] * wc.cand_c for _q in range(Q)]
             for _c in range(nch)]
    for cc in range(wc.cand_c):
        c_abs = (colb + 128 * cc + iota_l).astype(jnp.float32)
        srow = jnp.floor(a_f + b_f * c_abs).astype(jnp.int32)
        blocks = [[win_ref[ch, pl.ds(rb0 + 8 * b, 8),
                           pl.ds(cb0 + 128 * cc, 128)]
                   for b in range(wc.cand_r)] for ch in range(nch)]
        for q in range(Q):
            idx = jnp.clip(srow + (8 * q) + iota_s - rb0,
                           0, 8 * wc.cand_r - 1)
            rr_b = idx & 7
            qb_b = idx >> 3
            for ch in range(nch):
                v = jnp.take_along_axis(blocks[ch][0], rr_b, axis=0)
                for b in range(1, wc.cand_r):
                    g = jnp.take_along_axis(blocks[ch][b], rr_b,
                                            axis=0)
                    v = jnp.where(qb_b == b, g, v)
                bands[ch][q][cc] = v
    return bands, a_f, b_f


def _resolve_sheared(sx, sy, bands, a_f, b_f, *, degree: int,
                     wc: WindowClass, nch: int, cb0, col0):
    """Resolve one (8, TILE_W) row-block of taps against prebuilt
    sheared bands (see _shear_bands). ``sx``/``sy`` are
    window-relative continuous coordinates (possibly tap-deflected).
    Returns the per-channel list of (8, TILE_W) value vregs."""
    n1 = degree + 1
    off = degree // 2
    Q = wc.shear_q
    colb = col0 + cb0

    sely, ty = _split(sy, degree)
    by = sely - off
    wy = _weights_poly(ty, degree)

    selx, tx = _split(sx, degree)
    bx = selx - off
    bxc = jnp.broadcast_to(jnp.min(bx, axis=0, keepdims=True),
                           (8, TILE_W))
    lxc = jnp.clip(bxc - cb0, 0, 128 * wc.cand_c - 1)

    delta = bx - bxc
    wx = _weights_poly(tx, degree)
    wk = []
    for k in range(wc.k_taps):
        acc_w = None
        for j in range(n1):
            if k - j < 0:
                continue
            hit = delta == (k - j)
            acc_w = jnp.where(hit, wx[j],
                              0.0 if acc_w is None else acc_w)
        wk.append(acc_w if acc_w is not None
                  else jnp.zeros((8, TILE_W), jnp.float32))
    wjk = [[wy[j] * wk[k] for k in range(wc.k_taps)]
           for j in range(n1)]

    accs = [jnp.zeros((8, TILE_W), jnp.float32) for _ in range(nch)]
    for k in range(wc.k_taps):
        cxi = jnp.minimum(lxc + k, 128 * wc.cand_c - 1)
        qc = cxi >> 7
        rc = cxi & 127
        ct_abs = (colb + cxi).astype(jnp.float32)
        s_tap = jnp.floor(a_f + b_f * ct_abs).astype(jnp.int32)
        r0 = by - s_tap
        # column resolve per (channel, band): the shear is a function
        # of the source column, so the sublane-constant column gather
        # carries the correct row field along with the value
        cbs = []
        for ch in range(nch):
            per_q = []
            for q in range(Q):
                v = jnp.take_along_axis(bands[ch][q][0], rc, axis=1)
                for cc in range(1, wc.cand_c):
                    g = jnp.take_along_axis(bands[ch][q][cc], rc,
                                            axis=1)
                    v = jnp.where(qc == cc, g, v)
                per_q.append(v)
            cbs.append(per_q)
        for j in range(n1):
            r = jnp.clip(r0 + j, 0, 8 * Q - 1)
            rr_j = r & 7
            qb_j = r >> 3
            for ch in range(nch):
                v = jnp.take_along_axis(cbs[ch][0], rr_j, axis=0)
                for q in range(1, Q):
                    g = jnp.take_along_axis(cbs[ch][q], rr_j, axis=0)
                    v = jnp.where(qb_j == q, g, v)
                accs[ch] = accs[ch] + wjk[j][k] * v
    return accs


def _tap_coords(sx, sy, dux, duy, dvx, dvy, spread_ref, ti):
    """Deflect the center coordinates by twining tap ``ti``."""
    cx_t = spread_ref[ti * 3]
    cy_t = spread_ref[ti * 3 + 1]
    w_t = spread_ref[ti * 3 + 2]
    sxt = sx + cx_t * dux + cy_t * dvx
    syt = sy + cx_t * duy + cy_t * dvy
    return sxt, syt, w_t


def _union_minima(sx, sy, dux, duy, dvx, dvy, spread_ref, n_taps,
                  degree: int):
    """Elementwise minima of the integer tap bases over all twining
    taps (the union-tap kernel's shared gather origin)."""
    off = degree // 2

    def body(ti, carry):
        bymin, bxmin = carry
        sxt, syt, _w = _tap_coords(sx, sy, dux, duy, dvx, dvy,
                                   spread_ref, ti)
        by = _split(syt, degree)[0] - off
        bx = _split(sxt, degree)[0] - off
        return jnp.minimum(bymin, by), jnp.minimum(bxmin, bx)

    big = jnp.full(sx.shape, 2 ** 30, jnp.int32)
    return jax.lax.fori_loop(0, n_taps, body, (big, big))


def _tap_weights(sxt, syt, bxc_u, degree: int, wc: WindowClass):
    """Per-tap routing against the union column base: factorized
    vertical / horizontal weight vectors and the integer row base."""
    n1 = degree + 1
    off = degree // 2
    sely, ty = _split(syt, degree)
    by = sely - off
    wy = _weights_poly(ty, degree)
    selx, tx = _split(sxt, degree)
    bx = selx - off
    delta = bx - bxc_u
    wx = _weights_poly(tx, degree)
    wk = []
    for k in range(wc.k_taps):
        acc_w = None
        for j in range(n1):
            if k - j < 0:
                continue
            acc_w = jnp.where(delta == (k - j), wx[j],
                              0.0 if acc_w is None else acc_w)
        wk.append(acc_w if acc_w is not None
                  else jnp.zeros(sxt.shape, jnp.float32))
    return wy, wk, by


def _accumulate_weights(m_t, wy, wk, w_t, wacc, *, degree: int,
                        wc: WindowClass):
    """Accumulate one tap into the (k_taps, n1+u_span) weight planes.

    The union-tap accumulation runs in *weight space*: a tap's
    contribution to channel ch is sum_k sum_j wy[j]*wk[k] *
    cand[k][m_t+j][ch], so accumulating W[k][m] += w_t*wy[j]*wk[k]
    (with m = m_t + j) and combining with the candidate values ONCE
    after the tap loop (_combine_union) computes the same sum with a
    per-tap VPU cost independent of nch: the vertical routing is n1 *
    (u_span+1) selects on the weights, and the update is a rank-1
    outer product of the (k_taps) x (n1+u_span) weight matrix -
    instead of the former nch-deep value-select cascade per (k, j)."""
    n1 = degree + 1
    U = wc.u_span
    # the value cascade's default (no s in 1..u_span matches) was the
    # m_t == 0 candidate; keep that routing bit-identical
    sel0 = jnp.logical_or(m_t <= 0, m_t > U)
    sels = [sel0] + [m_t == s for s in range(1, U + 1)]
    wyr = [None] * (n1 + U)
    for j in range(n1):
        wj = w_t * wy[j]
        for s in range(U + 1):
            contrib = jnp.where(sels[s], wj, 0.0)
            m = j + s
            wyr[m] = contrib if wyr[m] is None else wyr[m] + contrib
    return tuple(
        tuple(wacc[k][m] + wk[k] * wyr[m] for m in range(n1 + U))
        for k in range(wc.k_taps))


def _combine_union(cand, wacc, *, degree: int, wc: WindowClass,
                   nch: int):
    """Post-tap-loop combine: weighted sum of the shared candidate
    rows with the accumulated per-(k, m) weight planes."""
    n1 = degree + 1
    acc = [jnp.zeros(wacc[0][0].shape, jnp.float32)
           for _c in range(nch)]
    for k in range(wc.k_taps):
        for m in range(n1 + wc.u_span):
            w = wacc[k][m]
            for ch in range(nch):
                acc[ch] = acc[ch] + w * cand[k][m][ch]
    return acc


def _union_minima_sep(sx, sy, dux, duy, dvy, spread_ref, kx: int,
                      ky: int, degree: int):
    """Tap-base minima for a tensor-grid spread with dvx == 0: the
    grid contains the (argmin over cx, argmin over cy) combination,
    and float addition is monotone, so the elementwise minimum over
    all kx*ky taps equals the minimum-deflection tap's value computed
    with the same operation order as _tap_coords."""
    off = degree // 2
    cx_lo = spread_ref[0]
    cx_hi = spread_ref[kx - 1]
    cy_lo = spread_ref[kx]
    cy_hi = spread_ref[kx + ky - 1]
    sx_min = sx + jnp.minimum(cx_lo * dux, cx_hi * dux)
    sy_min = (sy + jnp.minimum(cx_lo * duy, cx_hi * duy)
              + jnp.minimum(cy_lo * dvy, cy_hi * dvy))
    bymin = _split(sy_min, degree)[0] - off
    bxmin = _split(sx_min, degree)[0] - off
    return bymin, bxmin


def _union_sep_weights(sx, sy, dux, duy, dvy, spread_ref, kx: int,
                       ky: int, bxc_u, m_of, *, degree: int,
                       wc: WindowClass):
    """Accumulated (k_taps, n1+u_span) weight planes for a tensor-grid
    spread on a dvx == 0 tile. The horizontal routing (split + Horner
    weights + drift selects) depends only on the grid column there, so
    it runs kx times instead of kx*ky, and the rank-1 weight update
    becomes one outer product per column against the column's
    vertically-routed weight planes V. Exact: same taps, same weights
    as the per-tap loop - only the summation grouping differs (the
    'block-sum' restructuring of NOTES roadmap 3). ``m_of(by)`` maps
    the integer row base to the candidate index (plain vs sheared)."""
    n1 = degree + 1
    U = wc.u_span
    off = degree // 2
    wacc = tuple(tuple(jnp.zeros(sx.shape, jnp.float32)
                       for _m in range(n1 + U))
                 for _k in range(wc.k_taps))
    for i in range(kx):
        cx_i = spread_ref[i]
        sxt = sx + cx_i * dux
        selx, tx = _split(sxt, degree)
        bx = selx - off
        delta = bx - bxc_u
        wx = _weights_poly(tx, degree)
        wk = []
        for k in range(wc.k_taps):
            acc_w = None
            for j in range(n1):
                if k - j < 0:
                    continue
                acc_w = jnp.where(delta == (k - j), wx[j],
                                  0.0 if acc_w is None else acc_w)
            wk.append(acc_w if acc_w is not None
                      else jnp.zeros(sx.shape, jnp.float32))
        syt_i = sy + cx_i * duy

        def col_body(j, V):
            cy_j = spread_ref[kx + j]
            w_ij = spread_ref[kx + ky + j * kx + i]
            syt = syt_i + cy_j * dvy
            sely, ty = _split(syt, degree)
            by = sely - off
            wy = _weights_poly(ty, degree)
            m_t = m_of(by)
            sel0 = jnp.logical_or(m_t <= 0, m_t > U)
            sels = [sel0] + [m_t == s for s in range(1, U + 1)]
            Vl = [None] * (n1 + U)
            for jj in range(n1):
                wj = w_ij * wy[jj]
                for s in range(U + 1):
                    m = jj + s
                    contrib = jnp.where(sels[s], wj, 0.0)
                    Vl[m] = contrib if Vl[m] is None else Vl[m] + contrib
            return tuple(V[m] + Vl[m] for m in range(n1 + U))

        V0 = tuple(jnp.zeros(sx.shape, jnp.float32)
                   for _m in range(n1 + U))
        V = jax.lax.fori_loop(0, ky, col_body, V0)
        wacc = tuple(
            tuple(wacc[k][m] + wk[k] * V[m] for m in range(n1 + U))
            for k in range(wc.k_taps))
    return wacc


def _eval_row_block_union(sx, sy, dux, duy, dvx, dvy, spread_ref,
                          n_taps: int, win_ref, *, degree: int,
                          wc: WindowClass, nch: int, rb0, cb0,
                          grid=None, tap_w=None):
    """K-tap twined evaluation of one (8, TILE_W) row-block with the
    gather work shared across taps: the column resolve and
    n1 + u_span candidate rows are gathered ONCE per tap column
    (against the union tap bases), then each twining tap routes
    through them with per-element selects. Gather count is
    K-independent; admission requires the u_span row-footprint budget
    (classify_tiles) on top of the k_taps drift budget, which already
    covers the union column footprint (tile_stats_range)."""
    n1 = degree + 1
    U = wc.u_span

    if grid is not None:
        bymin, bxmin = _union_minima_sep(sx, sy, dux, duy, dvy,
                                         spread_ref, grid[0], grid[1],
                                         degree)
    else:
        bymin, bxmin = _union_minima(sx, sy, dux, duy, dvx, dvy,
                                     spread_ref, n_taps, degree)
    bxc_u = jnp.broadcast_to(jnp.min(bxmin, axis=0, keepdims=True),
                             sx.shape)
    if rb0 is None:
        rb0 = jnp.clip((jnp.min(bymin) // 8) * 8, 0,
                       wc.win_h - 8 * wc.cand_r)
        rb0 = pl.multiple_of(rb0, 8)
    if cb0 is None:
        cb0 = jnp.clip((jnp.min(bxc_u) // 128) * 128, 0,
                       wc.win_w - 128 * wc.cand_c)
        cb0 = pl.multiple_of(cb0, 128)
    lxc = jnp.clip(bxc_u - cb0, 0, 128 * wc.cand_c - 1)
    rl_lo = jnp.clip(bymin - rb0, 0, 8 * wc.cand_r - 1 - degree)

    # shared gathers: column resolve + candidate rows, once per k
    rrm = [jnp.minimum(rl_lo + m, 8 * wc.cand_r - 1)
           for m in range(n1 + U)]
    cand = [[[None] * nch for _m in range(n1 + U)]
            for _k in range(wc.k_taps)]
    blocks = [
        [[win_ref[ch, pl.ds(rb0 + 8 * b, 8),
                  pl.ds(cb0 + 128 * cc, 128)]
          for cc in range(wc.cand_c)]
         for b in range(wc.cand_r)]
        for ch in range(nch)
    ]
    for k in range(wc.k_taps):
        cx = jnp.minimum(lxc + k, 128 * wc.cand_c - 1)
        qc = cx >> 7
        rc = cx & 127
        for ch in range(nch):
            tb = []
            for b in range(wc.cand_r):
                v = jnp.take_along_axis(blocks[ch][b][0], rc, axis=1)
                for cc in range(1, wc.cand_c):
                    g = jnp.take_along_axis(blocks[ch][b][cc], rc,
                                            axis=1)
                    v = jnp.where(qc == cc, g, v)
                tb.append(v)
            for m in range(n1 + U):
                rr = rrm[m] & 7
                qb = rrm[m] >> 3
                v = jnp.take_along_axis(tb[0], rr, axis=0)
                for b in range(1, wc.cand_r):
                    g = jnp.take_along_axis(tb[b], rr, axis=0)
                    v = jnp.where(qb == b, g, v)
                cand[k][m][ch] = v

    if grid is not None:
        m_of = lambda by: (jnp.clip(by - rb0, 0,
                                    8 * wc.cand_r - 1 - degree)
                           - rl_lo)
        wacc = _union_sep_weights(sx, sy, dux, duy, dvy, spread_ref,
                                  grid[0], grid[1], bxc_u, m_of,
                                  degree=degree, wc=wc)
        return _combine_union(cand, wacc, degree=degree, wc=wc,
                              nch=nch)

    def tap_body(ti, wacc):
        sxt, syt, w_t = _tap_coords(sx, sy, dux, duy, dvx, dvy,
                                    spread_ref, ti)
        if tap_w is not None:
            # per-pixel tap selection (champion-routed band kernels):
            # w_t becomes an (8, TILE_W) plane; _accumulate_weights
            # broadcasts it through the weight-space update unchanged
            w_t = w_t * tap_w(ti)
        wy, wk, by = _tap_weights(sxt, syt, bxc_u, degree, wc)
        ly = jnp.clip(by - rb0, 0, 8 * wc.cand_r - 1 - degree)
        m_t = ly - rl_lo
        return _accumulate_weights(m_t, wy, wk, w_t, wacc,
                                   degree=degree, wc=wc)

    wacc0 = tuple(tuple(jnp.zeros(sx.shape, jnp.float32)
                        for _m in range(n1 + U))
                  for _k in range(wc.k_taps))
    wacc = jax.lax.fori_loop(0, n_taps, tap_body, wacc0)
    return _combine_union(cand, wacc, degree=degree, wc=wc, nch=nch)


def _resolve_sheared_union(sx, sy, dux, duy, dvx, dvy, spread_ref,
                           n_taps: int, bands, a_f, b_f, *,
                           degree: int, wc: WindowClass, nch: int,
                           cb0, col0, grid=None, tap_w=None):
    """Union-tap variant of _resolve_sheared: column resolve + the
    n1 + u_span candidate band rows gathered once per tap column,
    every twining tap routed through VPU selects. The shear row
    S(tap column) is tap-invariant under the union column base, so a
    tap's candidate index by_t - bymin is k-independent."""
    n1 = degree + 1
    U = wc.u_span
    Q = wc.shear_q
    colb = col0 + cb0

    if grid is not None:
        bymin, bxmin = _union_minima_sep(sx, sy, dux, duy, dvy,
                                         spread_ref, grid[0], grid[1],
                                         degree)
    else:
        bymin, bxmin = _union_minima(sx, sy, dux, duy, dvx, dvy,
                                     spread_ref, n_taps, degree)
    bxc_u = jnp.broadcast_to(jnp.min(bxmin, axis=0, keepdims=True),
                             sx.shape)
    lxc = jnp.clip(bxc_u - cb0, 0, 128 * wc.cand_c - 1)

    cand = [[[None] * nch for _m in range(n1 + U)]
            for _k in range(wc.k_taps)]
    for k in range(wc.k_taps):
        cxi = jnp.minimum(lxc + k, 128 * wc.cand_c - 1)
        qc = cxi >> 7
        rc = cxi & 127
        ct_abs = (colb + cxi).astype(jnp.float32)
        s_tap = jnp.floor(a_f + b_f * ct_abs).astype(jnp.int32)
        r_lo = bymin - s_tap
        cbs = []
        for ch in range(nch):
            per_q = []
            for q in range(Q):
                v = jnp.take_along_axis(bands[ch][q][0], rc, axis=1)
                for cc in range(1, wc.cand_c):
                    g = jnp.take_along_axis(bands[ch][q][cc], rc,
                                            axis=1)
                    v = jnp.where(qc == cc, g, v)
                per_q.append(v)
            cbs.append(per_q)
        for m in range(n1 + U):
            r = jnp.clip(r_lo + m, 0, 8 * Q - 1)
            rr_m = r & 7
            qb_m = r >> 3
            for ch in range(nch):
                v = jnp.take_along_axis(cbs[ch][0], rr_m, axis=0)
                for q in range(1, Q):
                    g = jnp.take_along_axis(cbs[ch][q], rr_m, axis=0)
                    v = jnp.where(qb_m == q, g, v)
                cand[k][m][ch] = v

    if grid is not None:
        wacc = _union_sep_weights(sx, sy, dux, duy, dvy, spread_ref,
                                  grid[0], grid[1], bxc_u,
                                  lambda by: by - bymin,
                                  degree=degree, wc=wc)
        return _combine_union(cand, wacc, degree=degree, wc=wc,
                              nch=nch)

    def tap_body(ti, wacc):
        sxt, syt, w_t = _tap_coords(sx, sy, dux, duy, dvx, dvy,
                                    spread_ref, ti)
        if tap_w is not None:
            w_t = w_t * tap_w(ti)
        wy, wk, by = _tap_weights(sxt, syt, bxc_u, degree, wc)
        m_t = by - bymin
        return _accumulate_weights(m_t, wy, wk, w_t, wacc,
                                   degree=degree, wc=wc)

    wacc0 = tuple(tuple(jnp.zeros(sx.shape, jnp.float32)
                        for _m in range(n1 + U))
                  for _k in range(wc.k_taps))
    wacc = jax.lax.fori_loop(0, n_taps, tap_body, wacc0)
    return _combine_union(cand, wacc, degree=degree, wc=wc, nch=nch)


def _eval_row_block_sheared(sx, sy, win_ref, *, degree: int,
                            wc: WindowClass, nch: int, rb0, cb0,
                            a_fix, b_fix, col0):
    """Sheared-window tensor-product evaluation for one (8, TILE_W)
    vreg row-block (see WindowClass.shear_q). ``sx``/``sy`` are
    window-relative; ``col0`` is the window origin's absolute (padded
    array) column, so the shear line ``S(c) = floor(a + b*c)`` is
    evaluated in the same absolute column coordinates the classifier
    fitted it in. ``a_fix`` carries the classifier's residual shift
    (rlo - 1 - oy folded in), so residuals land in [0, 8*shear_q).

    Exactness: the shear only re-bases the *row resolve* - each tap
    still reads the coefficient at its exact (row, column) address and
    is weighted by the exact basis weight; the classifier admits a tile
    only if every used residual fits the band budget (with a 1-row
    margin for float wobble in the two floor() evaluations)."""
    bands, a_f, b_f = _shear_bands(win_ref, degree=degree, wc=wc,
                                   nch=nch, rb0=rb0, cb0=cb0,
                                   a_fix=a_fix, b_fix=b_fix,
                                   col0=col0)
    return _resolve_sheared(sx, sy, bands, a_f, b_f, degree=degree,
                            wc=wc, nch=nch, cb0=cb0, col0=col0)


def _resample_kernel(origins_ref,            # scalar prefetch (nt, 2)
                     sx_ref, sy_ref,         # (TILE_H, TILE_W) VMEM
                     coeff_ref,              # (C, Hp, Wp) in HBM/ANY
                     out_ref,                # (C, TILE_H, TILE_W) VMEM
                     win_ref, sem,           # scratch: window + DMA sem
                     *, degree: int, wc: WindowClass, nch: int,
                     ntx: int):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tid = ti * ntx + tj
    # origins is flat (nt*3,): 2D SMEM arrays get lane-padded to 128
    oy = pl.multiple_of(origins_ref[tid * 3], 8)
    ox = pl.multiple_of(origins_ref[tid * 3 + 1], 128)
    active = origins_ref[tid * 3 + 2]

    @pl.when(active != 0)
    def _do_copy():
        copy = pltpu.make_async_copy(
            coeff_ref.at[:, pl.ds(oy, wc.win_h), pl.ds(ox, wc.win_w)],
            win_ref, sem)
        copy.start()
        copy.wait()

    oyf = oy.astype(jnp.float32)
    oxf = ox.astype(jnp.float32)

    def row_body(r, _):
        sx = sx_ref[pl.ds(r * 8, 8), :] - oxf
        sy = sy_ref[pl.ds(r * 8, 8), :] - oyf
        accs = _eval_row_block(sx, sy, win_ref, degree=degree, wc=wc,
                               nch=nch)
        for ch in range(nch):
            out_ref[ch, pl.ds(r * 8, 8), :] = accs[ch]
        return _

    @pl.when(active != 0)
    def _do_rows():
        jax.lax.fori_loop(0, TILE_H // 8, row_body, 0)


@functools.partial(jax.jit, static_argnames=("degree", "wc", "interpret"))
def resample_planar(coeff: jnp.ndarray, sx: jnp.ndarray, sy: jnp.ndarray,
                    origins: jnp.ndarray, *, degree: int,
                    wc: WindowClass = LOCAL,
                    interpret: bool = False) -> jnp.ndarray:
    """Evaluate the spline held in planar padded coefficients ``coeff``
    (C, Hp, Wp) at continuous padded-array coordinates (sx, sy), both
    (H, W) with H % 128 == W % 128 == 0. ``origins`` is int32 (nt, 3)
    with per-tile (oy, ox, active), oy % 8 == 0, ox % 128 == 0, in
    bounds (flattened internally - 2D SMEM prefetch arrays would be
    lane-padded). Returns (C, H, W) float32. Tiles must satisfy the
    window-class budgets (see classify_tiles); others produce clamped
    garbage and must be overwritten by the fallback path."""
    nch, hp, wp = coeff.shape
    ha, wa = aligned_dims(hp, wp, wc)
    if (ha, wa) != (hp, wp):
        coeff = jnp.pad(coeff, ((0, 0), (0, ha - hp), (0, wa - wp)),
                        mode="edge")
        nch, hp, wp = coeff.shape
    h, w = sx.shape
    nty, ntx = h // TILE_H, w // TILE_W

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nty, ntx),
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, o: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j, o: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((nch, TILE_H, TILE_W),
                               lambda i, j, o: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nch, wc.win_h, wc.win_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kern = functools.partial(_resample_kernel, degree=degree, wc=wc,
                             nch=nch, ntx=ntx)
    if origins.ndim == 2:
        if origins.shape[1] == 2:  # no active column: all tiles on
            origins = jnp.concatenate(
                [origins, jnp.ones((origins.shape[0], 1), jnp.int32)],
                axis=1)
        origins = origins.reshape(-1)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nch, h, w), jnp.float32),
        interpret=interpret or FORCE_INTERPRET,
    )(origins, sx, sy, coeff)


def _dbuf_ok(wc: WindowClass, nch: int, itemsize: int = 4) -> bool:
    """Whether two window buffers (cross-grid-step DMA double
    buffering) plus the f32 upcast buffer (bf16 storage) fit the
    ~16MB VMEM next to the revolving in/out blocks."""
    per_elem = 2 * itemsize + (4 if itemsize < 4 else 0)
    return nch * wc.win_h * wc.win_w * per_elem <= 11 * 2 ** 20


def _load_tile_window(tiles_ref, coeff_ref, scratch, *, t, stride,
                      wc: WindowClass, nch: int, nt: int, dbuf: bool):
    """Shared window-DMA preamble of the compact-grid kernels: bring
    tile ``t``'s coefficient window into VMEM (double-buffered when
    the class fits two slots) and upcast bf16 storage to f32."""
    win_ref, sem = scratch[0], scratch[1]
    f32_ref = scratch[2] if len(scratch) > 2 else None

    if dbuf:
        # two window slots: tile t+1's window DMA runs while tile t
        # computes (grid steps are sequential on a core, so scratch
        # and semaphores persist across steps)
        def get_dma(slot, ti):
            oy_i = pl.multiple_of(tiles_ref[ti * stride + 4], 8)
            ox_i = pl.multiple_of(tiles_ref[ti * stride + 5], 128)
            return pltpu.make_async_copy(
                coeff_ref.at[:, pl.ds(oy_i, wc.win_h),
                             pl.ds(ox_i, wc.win_w)],
                win_ref.at[slot], sem.at[slot])

        slot = jax.lax.rem(t, 2)

        @pl.when(t == 0)
        def _warm():
            get_dma(0, 0).start()

        @pl.when(t + 1 < nt)
        def _prefetch():
            get_dma(jax.lax.rem(t + 1, 2), t + 1).start()

        get_dma(slot, t).wait()
        win = win_ref.at[slot]
    else:
        oy0 = pl.multiple_of(tiles_ref[t * stride + 4], 8)
        ox0 = pl.multiple_of(tiles_ref[t * stride + 5], 128)
        copy = pltpu.make_async_copy(
            coeff_ref.at[:, pl.ds(oy0, wc.win_h), pl.ds(ox0, wc.win_w)],
            win_ref, sem)
        copy.start()
        copy.wait()
        win = win_ref

    if f32_ref is not None:
        # bfloat16 coefficient storage: DMA moved half the bytes; one
        # upcast pass per tile keeps the gather path f32
        for ch in range(nch):
            f32_ref[ch] = win[ch].astype(jnp.float32)
        win = f32_ref
    return win


# In-kernel interleaved emit: measured a net LOSS on chip for the
# fused resample kernels, so it is opt-in (ENVUTIL_INTERLEAVE=1).
# The lane stretch out[l] = vals[l % 3][l // 3] needs a lane
# permutation engine; Mosaic's only correct one here is
# dynamic_gather (take_along_axis), and the kernels are already
# gather-ISSUE-bound (>= 93% of frame time), so the 9 extra gathers
# + 6 selects per row block cost +0.76..+1.4 us/tile (probe_ilv,
# v5e) = +1.2..+2.1 ms on the 8K headline - MORE than the 0.95 ms
# XLA planar->interleaved relayout they replace (headline measured
# 2180 Mpix/s in-kernel vs 2985 planar+relayout). Alternatives
# tried and rejected on-chip: pltpu.repeat is a tile-concat (wrong
# values for a stretch - verified, NOT an element repeat), strided
# lane stores / jnp.repeat / broadcast+reshape fail to lower, an
# MXU permutation matmul needs f32 matmul (4-8x the bf16 rate,
# ~2 ms/frame), and a dedicated relayout kernel is bound by the
# same gather issue rate (~1 ms/frame). The stretch fundamentally
# fans one source lane into 3 output lanes, which no rotate/select
# network does in O(1).
_ILV_ON = os.environ.get("ENVUTIL_INTERLEAVE") == "1"


def _emit_rows(out_ref, r, vals, *, interleave: bool,
               mask_f32=None, cin_ref=None):
    """Write one 8-row block of per-channel values into the output.

    ``interleave=False``: planar store per channel plane (out block
    ``(nch, TILE_H, TILE_W)``), optionally merged over the prior
    canvas contents where ``mask_f32 <= 0.5``.

    ``interleave=True`` (nch == 3 only): the out block is
    ``(TILE_H, 3*TILE_W)`` holding pixel-interleaved rows
    ``r0 g0 b0 r1 g1 b1 ...`` - exactly the row-major bytes of an
    ``(H, W, 3)`` image, so the caller's ``reshape(H, W, 3)`` is a
    layout no-op and the XLA planar->interleaved finish relayout
    (0.04-0.9 ms/frame on the 8K headline; the reference's timed
    render writes an interleaved target, envutil_payload.cc:476-557)
    disappears. Each of the 3 output vregs gathers its source pixels
    from the three channel accumulators with STATIC per-lane indices
    (``(j*128+l)//3`` - one (8,128) lane shuffle per (channel,
    out-vreg) pair, 9 per row block) and channel-selects on the
    static period-3 lane pattern; the merge mask rides through the
    same shuffle. See the _ILV_ON comment for why this emit is
    opt-in: the extra gathers contend with the kernels' own
    gather-bound inner loop and cost more than the XLA relayout
    they remove."""
    sl8 = pl.ds(r * 8, 8)
    nch = len(vals)
    if not interleave:
        m = None if mask_f32 is None else mask_f32 > 0.5
        for ch in range(nch):
            if m is not None:
                out_ref[ch, sl8, :] = jnp.where(
                    m, vals[ch], cin_ref[ch, sl8, :])
            else:
                out_ref[ch, sl8, :] = vals[ch]
        return
    assert nch == 3, "interleaved emit is 3-channel only"
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, TILE_W), 1)
    for j in range(3):
        pos = j * TILE_W + lane
        idx = pos // 3
        cha = pos % 3
        g = [jnp.take_along_axis(v, idx, axis=1) for v in vals]
        o = jnp.where(cha == 0, g[0],
                      jnp.where(cha == 1, g[1], g[2]))
        csl = pl.ds(j * TILE_W, TILE_W)
        if mask_f32 is not None:
            mg = jnp.take_along_axis(mask_f32, idx, axis=1) > 0.5
            o = jnp.where(mg, o, cin_ref[sl8, csl])
        out_ref[sl8, csl] = o


def _emit_rows_passthrough(out_ref, r, cin_ref, *, interleave: bool,
                           nch: int):
    """Merge pass row block with no dominated pixels: copy the prior
    canvas contents through."""
    sl8 = pl.ds(r * 8, 8)
    if interleave:
        out_ref[sl8, :] = cin_ref[sl8, :]
    else:
        for ch in range(nch):
            out_ref[ch, sl8, :] = cin_ref[ch, sl8, :]


def _emit_rows_zero(out_ref, r, *, interleave: bool, nch: int):
    """Unchampioned tapsel row block: write zeros."""
    sl8 = pl.ds(r * 8, 8)
    if interleave:
        out_ref[sl8, :] = jnp.zeros((8, 3 * TILE_W), jnp.float32)
    else:
        for ch in range(nch):
            out_ref[ch, sl8, :] = jnp.zeros((8, TILE_W), jnp.float32)


def _resample_kernel_into(tiles_ref,          # scalar prefetch (nt*6,)
                          sx_ref, sy_ref,     # (TILE_H, TILE_W) VMEM
                          *rest,
                          degree: int, wc: WindowClass, nch: int,
                          nt: int, dbuf: bool, unroll: int,
                          stride: int, merge: bool = False,
                          interleave: bool = False):
    # merge=False: coeff, canvas (aliased output, unread), out
    # merge=True:  mask (f32 TILE blocks), coeff, canvas-in (VMEM
    #              blocks, aliased to the output), out - tile pixels
    #              with mask <= 0.5 keep the canvas's prior contents
    #              (per-pixel overlay for face-boundary tiles)
    if merge:
        mask_ref, coeff_ref, cin_ref, out_ref, *scratch = rest
    else:
        mask_ref = cin_ref = None
        coeff_ref, _canvas_ref, out_ref, *scratch = rest
    t = pl.program_id(0)
    ext = stride >= TILE_ROW_INTS_EXT
    win = _load_tile_window(tiles_ref, coeff_ref, scratch, t=t,
                            stride=stride, wc=wc, nch=nch, nt=nt,
                            dbuf=dbuf)

    oyf = tiles_ref[t * stride + 4].astype(jnp.float32)
    oxf = tiles_ref[t * stride + 5].astype(jnp.float32)

    def eval_rows(r):
        sx = sx_ref[pl.ds(r * 8, 8), :] - oxf
        sy = sy_ref[pl.ds(r * 8, 8), :] - oyf
        if wc.shear_q:
            base = t * stride + TILE_ROW_INTS + 4 * r
            return _eval_row_block_sheared(
                sx, sy, win, degree=degree, wc=wc, nch=nch,
                rb0=pl.multiple_of(tiles_ref[base], 8),
                cb0=pl.multiple_of(tiles_ref[base + 1], 128),
                a_fix=tiles_ref[base + 2], b_fix=tiles_ref[base + 3],
                col0=tiles_ref[t * stride + 5])
        rb0 = cb0 = None
        if ext:
            base = t * stride + TILE_ROW_INTS + 2 * r
            rb0 = pl.multiple_of(tiles_ref[base], 8)
            cb0 = pl.multiple_of(tiles_ref[base + 1], 128)
        return _eval_row_block(sx, sy, win, degree=degree, wc=wc,
                               nch=nch, rb0=rb0, cb0=cb0)

    def row_body(r, _):
        if merge:
            # a merge pass writes only the pixels it dominates; a tile
            # split between faces leaves whole row-blocks to the other
            # faces' passes - skip their gather work entirely and pass
            # the prior canvas through
            mf = mask_ref[pl.ds(r * 8, 8), :]
            any_m = jnp.any(mf > 0.5)

            @pl.when(any_m)
            def _dominated():
                accs = eval_rows(r)
                _emit_rows(out_ref, r, accs, interleave=interleave,
                           mask_f32=mf, cin_ref=cin_ref)

            @pl.when(jnp.logical_not(any_m))
            def _pass_through():
                _emit_rows_passthrough(out_ref, r, cin_ref,
                                       interleave=interleave,
                                       nch=nch)
        else:
            accs = eval_rows(r)
            _emit_rows(out_ref, r, accs, interleave=interleave)
        return _

    # Mosaic lowers fori_loop with unroll=1 or full unroll only
    jax.lax.fori_loop(0, TILE_H // 8, row_body, 0,
                      unroll=(TILE_H // 8) if unroll else 1)


@functools.partial(jax.jit, static_argnames=("degree", "wc",
                                             "interpret", "unroll",
                                             "interleave"))
def resample_planar_into(canvas: jnp.ndarray, coeff: jnp.ndarray,
                         sx: jnp.ndarray, sy: jnp.ndarray,
                         tiles: jnp.ndarray, *, degree: int,
                         wc: WindowClass = LOCAL,
                         interpret: bool = False,
                         unroll: bool = False,
                         merge_mask: jnp.ndarray = None,
                         interleave: bool = False
                         ) -> jnp.ndarray:
    """Compact-grid variant of resample_planar: one grid step per
    listed tile (no inactive steps, no per-tile traffic for tiles the
    pass does not own), writing straight into ``canvas`` (donated and
    returned - tiles not listed keep their previous contents).
    ``tiles`` is int32 (nt, 6) or (nt, TILE_ROW_INTS_EXT): (in_by,
    in_bx, out_by, out_bx, oy, ox) with in_* the (TILE_H, TILE_W)
    block indices into sx/sy (which may be a crop), out_* the block
    indices into canvas, and (oy, ox) the aligned source-window origin
    (oy % 8 == 0, ox % 128 == 0). The extended form appends NRB
    (rb0, cb0) per-row-block candidate origins (window-relative,
    8/128-aligned, from the classifier stats - see
    row_block_origins).

    ``merge_mask`` (same shape as sx, float32 0/1): per-pixel overlay
    mode - pixels with mask <= 0.5 keep the canvas's prior contents.
    Used for cubemap face-boundary tiles, where each contributing
    face's pass writes exactly the pixels that face dominates
    (fastpath.plan_passes boundary phase)."""
    nch, hp, wp = coeff.shape
    ha, wa = aligned_dims(hp, wp, wc)
    if (ha, wa) != (hp, wp):
        coeff = jnp.pad(coeff, ((0, 0), (0, ha - hp), (0, wa - wp)),
                        mode="edge")
        nch, hp, wp = coeff.shape
    bf16 = coeff.dtype == jnp.bfloat16
    dbuf = _dbuf_ok(wc, nch, coeff.dtype.itemsize) and not (interpret or FORCE_INTERPRET)
    nt, stride = tiles.shape
    if wc.shear_q:
        assert stride == TILE_ROW_INTS_SHEAR, \
            "sheared classes need row_block_shear extended tile rows"

    scratch = [
        pltpu.VMEM(((2,) if dbuf else ()) +
                   (nch, wc.win_h, wc.win_w), coeff.dtype),
        pltpu.SemaphoreType.DMA((2,)) if dbuf
        else pltpu.SemaphoreType.DMA,
    ]
    if bf16:
        scratch.append(pltpu.VMEM((nch, wc.win_h, wc.win_w),
                                  jnp.float32))

    if interleave:
        assert nch == 3 and canvas.ndim == 2, \
            "interleave: 3-channel (ph, 3*pw) canvas"
    in_block = pl.BlockSpec((TILE_H, TILE_W),
                            lambda t, o: (o[t * stride],
                                          o[t * stride + 1]),
                            memory_space=pltpu.VMEM)
    canvas_block = (pl.BlockSpec(
        (TILE_H, 3 * TILE_W),
        lambda t, o: (o[t * stride + 2], o[t * stride + 3]),
        memory_space=pltpu.VMEM) if interleave else pl.BlockSpec(
        (nch, TILE_H, TILE_W),
        lambda t, o: (0, o[t * stride + 2], o[t * stride + 3]),
        memory_space=pltpu.VMEM))
    merge = merge_mask is not None
    if merge:
        # the canvas rides as a VMEM-blocked *input* mapped to the
        # output tile (and aliased to the output), so the kernel can
        # read the prior contents it merges over
        in_specs = [in_block, in_block, in_block,
                    pl.BlockSpec(memory_space=pl.ANY),
                    canvas_block]
        operands = (tiles.reshape(-1), sx, sy, merge_mask, coeff,
                    canvas)
        alias = {5: 0}
    else:
        in_specs = [in_block, in_block,
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY)]
        operands = (tiles.reshape(-1), sx, sy, coeff, canvas)
        alias = {4: 0}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=canvas_block,
        scratch_shapes=scratch,
    )
    kern = functools.partial(_resample_kernel_into, degree=degree,
                             wc=wc, nch=nch, nt=nt, dbuf=dbuf,
                             unroll=unroll, stride=stride,
                             merge=merge, interleave=interleave)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(canvas.shape, jnp.float32),
        input_output_aliases=alias,  # canvas (incl. scalar operand)
        interpret=interpret or FORCE_INTERPRET,
    )(*operands)


# ---------------------------------------------------------------------------
# inline-coordinates variant: the whole coordinate chain (target planar
# -> ray -> camera rotation -> source lon/lat -> spline affine -> gate)
# runs INSIDE the kernel per row-block, so the per-frame XLA coordinate
# passes and their sx/sy HBM round trip (25-40% of a solo frame)
# disappear. The stepper affine rides in as tiny per-axis feature
# arrays (host float64 axes, bit-identical to the XLA path's
# planar_grid; for cubemap/biatan6 targets the per-face planar shift
# and the biatan6 tan are folded into the y-axis array, since the face
# is a function of the row alone - stepper._cubemap_target_rays), and
# the traced camera rotation x per-face permutation rides in as a
# (nfaces, 9) SMEM matrix table (in_face_to_ray as a 3x3 each,
# geometry.h:577-637). Source side: spherical atan2 math
# (ray_to_ll, geometry.h:277-301 - scale-invariant, so the rays skip
# normalization), the model->spline affine and the PERIODIC/REFLECT
# gates (zimt/eval.h:2003-2031) as a handful of VPU ops.
# Classification still runs on the XLA coordinate pass at plan time;
# in-kernel transcendentals differ from XLA's by ulps, which the
# class budgets' rounding slack absorbs.
# ---------------------------------------------------------------------------

def _atan2(y, x):
    """Branchless float32 atan2 for the inline-coordinates kernel
    (Mosaic has no atan/atan2 primitive). Quadrant folding over a
    minimax odd polynomial on [0, sqrt(2)-1] (the classic fdlibm
    atanf coefficient set) with the a > sqrt(2)-1 range cut via
    atan(a) = pi/4 + atan((a-1)/(a+1)); ~2 ulp vs XLA's atan2, i.e.
    coordinate differences of ~1e-7 * image width."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    q = lo / jnp.maximum(hi, 1e-30)
    red = q > 0.4142135624
    t = jnp.where(red, (q - 1.0) / (q + 1.0), q)
    s = t * t
    p = 6.1687607318e-02
    p = p * s - 1.0648017377e-01
    p = p * s + 1.4253635705e-01
    p = p * s - 1.9999158382e-01
    p = p * s + 3.3333328366e-01
    r = t - t * (s * p)
    r = jnp.where(red, 0.78539816339744831 + r, r)
    r = jnp.where(ay > ax, 1.5707963267948966 - r, r)
    r = jnp.where(x < 0.0, math.pi - r, r)
    return jnp.where(y < 0.0, -r, r)


def _gate_const(v, mode: str, lower: float, upper: float):
    """In-kernel spline gate (ops/spline.gate with static bounds)."""
    if mode == "periodic":
        return lower + jnp.mod(v - lower, upper - lower)
    if mode == "mirror":
        period = 2.0 * (upper - lower)
        t = jnp.mod(v - lower, period)
        return lower + jnp.minimum(t, period - t)
    return jnp.clip(v, lower, upper)


def _inline_coords_rb(xf_ref, yf_ref, bm, sl8, *, tmode: str,
                      consts: tuple, xi: int = 0, yi: int = 0,
                      smode: str = "sph"):
    """(sx, sy) padded spline coordinates for one (8, TILE_W)
    row-block, computed from the axis-feature blocks and the per-tile
    3x3 matrix. ``xi``/``yi`` select the feature set (0 = center,
    1 = DERIV_BIAS-biased axis - the twined kernel's derivative
    grids). ``smode`` is the SOURCE-side math: "sph" (full-spherical
    mount: atan2 lon/lat + gates + spline affine) or
    "cubemap"/"biatan6" (IR pickup: dominant-axis face selection +
    in-face division + per-face section offset - ray_to_cubeface /
    get_pickup_coordinate_px in-kernel, geometry.h:1178-1357 /
    metrics.h:396-440; consts[11] carries section_px)."""
    (kx, cx, ky, cy, gate_x, glx, gux, gate_y, gly, guy,
     pad) = consts[:11]
    if tmode == "affine":
        # rect/cubemap/biatan6 targets: ray = B @ (px, py', 1)
        px = xf_ref[xi]
        py = yf_ref[yi, sl8, :]
        rx = bm[0] * px + bm[1] * py + bm[2]
        ry = bm[3] * px + bm[4] * py + bm[5]
        rz = bm[6] * px + bm[7] * py + bm[8]
    elif tmode == "sph":
        # spherical target: ray = B @ (sl*ct, st, cl*ct)
        sl_, cl_ = xf_ref[2 * xi], xf_ref[2 * xi + 1]
        st_ = yf_ref[2 * yi, sl8, :]
        ct_ = yf_ref[2 * yi + 1, sl8, :]
        ux = sl_ * ct_
        uz = cl_ * ct_
        rx = bm[0] * ux + bm[1] * st_ + bm[2] * uz
        ry = bm[3] * ux + bm[4] * st_ + bm[5] * uz
        rz = bm[6] * ux + bm[7] * st_ + bm[8] * uz
    else:  # "cyl": ray = B @ (sin(az), y, cos(az))
        sl_, cl_ = xf_ref[2 * xi], xf_ref[2 * xi + 1]
        uy = yf_ref[yi, sl8, :]
        rx = bm[0] * sl_ + bm[1] * uy + bm[2] * cl_
        ry = bm[3] * sl_ + bm[4] * uy + bm[5] * cl_
        rz = bm[6] * sl_ + bm[7] * uy + bm[8] * cl_

    if smode == "sph":
        lon = _atan2(rx, rz)
        lat = _atan2(ry, jnp.sqrt(rx * rx + rz * rz))
        sx = _gate_const(lon * kx + cx, gate_x, glx, gux) + pad
        sy = _gate_const(lat * ky + cy, gate_y, gly, guy) + pad
        return sx, sy

    # cubemap / biatan6 IR pickup: dominant-axis face + in-face coords
    # (the same where-cascade as geometry.ray_to_cubeface, so the face
    # choice is bitwise-consistent with the planner's XLA pass up to
    # ray ulps; admitted tiles are strictly single-face with >= 1 px
    # margins, so an ulp-level flip cannot occur there)
    section_px = consts[11]
    ax = jnp.abs(rx)
    ay = jnp.abs(ry)
    az = jnp.abs(rz)
    m1 = ax >= ay
    m2 = ax >= az
    m3 = ay >= az
    dom_x = jnp.logical_and(m1, m2)
    dom_z = jnp.logical_and(jnp.logical_not(m2), jnp.logical_not(m3))
    safe = lambda d: jnp.where(d == 0.0, 1.0, d)
    fx = jnp.where(dom_x, -rz / safe(rx),
                   jnp.where(dom_z, rx / safe(rz), -rx / safe(ay)))
    fy = jnp.where(dom_x, ry / safe(ax),
                   jnp.where(dom_z, ry / safe(az), rz / safe(ry)))
    face = jnp.where(
        dom_x, jnp.where(rx < 0.0, 0.0, 1.0),
        jnp.where(dom_z, jnp.where(rz < 0.0, 5.0, 4.0),
                  jnp.where(ry < 0.0, 2.0, 3.0)))
    if smode == "biatan6":
        one = jnp.ones_like(fx)
        fx = (4.0 / math.pi) * _atan2(fx, one)
        fy = (4.0 / math.pi) * _atan2(fy, one)
    sx = fx * kx + cx + pad
    sy = fy * ky + cy + face * section_px + pad
    return sx, sy


def _inline_kernel_into(tiles_ref, faces_ref,   # scalar prefetch
                        xf_ref, yf_ref,         # axis-feature blocks
                        bm_ref, eps_ref,        # SMEM
                        coeff_ref,              # HBM/ANY
                        _canvas_ref, out_ref, *scratch,
                        degree: int, wc: WindowClass, nch: int,
                        nt: int, dbuf: bool, unroll: int, stride: int,
                        tmode: str, consts: tuple,
                        smode: str = "sph",
                        interleave: bool = False):
    t = pl.program_id(0)
    ext = stride >= TILE_ROW_INTS_EXT
    win = _load_tile_window(tiles_ref, coeff_ref, scratch, t=t,
                            stride=stride, wc=wc, nch=nch, nt=nt,
                            dbuf=dbuf)
    oyf = tiles_ref[t * stride + 4].astype(jnp.float32)
    oxf = tiles_ref[t * stride + 5].astype(jnp.float32)
    f = faces_ref[t]
    bm = [bm_ref[f, k] for k in range(9)]
    eps = eps_ref[0]

    def row_body(r, _):
        sl8 = pl.ds(r * 8, 8)
        sx, sy = _inline_coords_rb(xf_ref, yf_ref, bm, sl8,
                                   tmode=tmode, consts=consts,
                                   smode=smode)
        sx = sx + eps - oxf
        sy = sy - oyf

        if wc.shear_q:
            base = t * stride + TILE_ROW_INTS + 4 * r
            accs = _eval_row_block_sheared(
                sx, sy, win, degree=degree, wc=wc, nch=nch,
                rb0=pl.multiple_of(tiles_ref[base], 8),
                cb0=pl.multiple_of(tiles_ref[base + 1], 128),
                a_fix=tiles_ref[base + 2], b_fix=tiles_ref[base + 3],
                col0=tiles_ref[t * stride + 5])
        else:
            rb0 = cb0 = None
            if ext:
                base = t * stride + TILE_ROW_INTS + 2 * r
                rb0 = pl.multiple_of(tiles_ref[base], 8)
                cb0 = pl.multiple_of(tiles_ref[base + 1], 128)
            accs = _eval_row_block(sx, sy, win, degree=degree, wc=wc,
                                   nch=nch, rb0=rb0, cb0=cb0)
        _emit_rows(out_ref, r, accs, interleave=interleave)
        return _

    jax.lax.fori_loop(0, TILE_H // 8, row_body, 0,
                      unroll=(TILE_H // 8) if unroll else 1)


@functools.partial(jax.jit, static_argnames=("degree", "wc",
                                             "interpret", "unroll",
                                             "tmode", "consts",
                                             "smode", "interleave"))
def resample_inline_into(canvas: jnp.ndarray, coeff: jnp.ndarray,
                         tiles: jnp.ndarray, faces: jnp.ndarray,
                         xfeat: jnp.ndarray, yfeat: jnp.ndarray,
                         bmats: jnp.ndarray, eps, *, degree: int,
                         tmode: str, consts: tuple,
                         smode: str = "sph",
                         wc: WindowClass = LOCAL,
                         interpret: bool = False,
                         unroll: bool = False,
                         interleave: bool = False) -> jnp.ndarray:
    """resample_planar_into with the coordinate chain fused into the
    kernel (see the section comment above). Operands beyond the shared
    ones:

    - ``faces``: int32 (nt,) per-tile row index into ``bmats`` (the
      cube face for cubemap/biatan6 targets, 0 otherwise).
    - ``xfeat``: float32 (Fx, 8, W) x-axis features replicated over
      the 8 sublanes (affine: planar x; sph/cyl: sin/cos of azimuth).
    - ``yfeat``: float32 (Fy, H, 128) y-axis features replicated over
      the 128 lanes (affine: per-face-shifted planar y; sph: sin/cos
      of elevation; cyl: planar y).
    - ``bmats``: float32 (nfaces, 9) traced rotation (x per-face
      in_face permutation) matrices, row-major.
    - ``eps``: float32 (1,) coordinate offset (0; benchmark loops pass
      a vanishing carry-dependent value to defeat hoisting).
    - ``consts``: static (kx, cx, ky, cy, gate_x, glx, gux, gate_y,
      gly, guy, pad) - the model->spline affine and gate bounds."""
    nch, hp, wp = coeff.shape
    ha, wa = aligned_dims(hp, wp, wc)
    if (ha, wa) != (hp, wp):
        coeff = jnp.pad(coeff, ((0, 0), (0, ha - hp), (0, wa - wp)),
                        mode="edge")
        nch, hp, wp = coeff.shape
    bf16 = coeff.dtype == jnp.bfloat16
    dbuf = _dbuf_ok(wc, nch, coeff.dtype.itemsize) and not (interpret or FORCE_INTERPRET)
    nt, stride = tiles.shape
    if wc.shear_q:
        assert stride == TILE_ROW_INTS_SHEAR, \
            "sheared classes need row_block_shear extended tile rows"

    scratch = [
        pltpu.VMEM(((2,) if dbuf else ()) +
                   (nch, wc.win_h, wc.win_w), coeff.dtype),
        pltpu.SemaphoreType.DMA((2,)) if dbuf
        else pltpu.SemaphoreType.DMA,
    ]
    if bf16:
        scratch.append(pltpu.VMEM((nch, wc.win_h, wc.win_w),
                                  jnp.float32))

    nfx = xfeat.shape[0]
    nfy = yfeat.shape[0]
    in_specs = [
        pl.BlockSpec((nfx, 8, TILE_W),
                     lambda t, o, f: (0, 0, o[t * stride + 3]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nfy, TILE_H, 128),
                     lambda t, o, f: (0, o[t * stride + 2], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if interleave:
        assert nch == 3 and canvas.ndim == 2, \
            "interleave: 3-channel (ph, 3*pw) canvas"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(
            (TILE_H, 3 * TILE_W),
            lambda t, o, f: (o[t * stride + 2], o[t * stride + 3]),
            memory_space=pltpu.VMEM) if interleave else pl.BlockSpec(
            (nch, TILE_H, TILE_W),
            lambda t, o, f: (0, o[t * stride + 2],
                             o[t * stride + 3]),
            memory_space=pltpu.VMEM)),
        scratch_shapes=scratch,
    )
    kern = functools.partial(_inline_kernel_into, degree=degree,
                             wc=wc, nch=nch, nt=nt, dbuf=dbuf,
                             unroll=unroll, stride=stride,
                             tmode=tmode, consts=consts, smode=smode,
                             interleave=interleave)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(canvas.shape, jnp.float32),
        input_output_aliases={7: 0},  # canvas (incl. prefetch args)
        interpret=interpret or FORCE_INTERPRET,
    )(tiles.reshape(-1), faces, xfeat, yfeat, bmats,
      jnp.asarray(eps, jnp.float32).reshape(1), coeff, canvas)


def _inline_twined_kernel_into(tiles_ref, faces_ref, spread_ref,
                               xf_ref, yf_ref, bm_ref, eps_ref,
                               coeff_ref, _canvas_ref, out_ref,
                               *scratch,
                               degree: int, wc: WindowClass, nch: int,
                               n_taps: int, nt: int, dbuf: bool,
                               stride: int, tmode: str,
                               consts: tuple, smode: str = "sph",
                               grid=None, interleave: bool = False):
    """Twined variant of _inline_kernel_into: the center and the two
    DERIV_BIAS-biased coordinate grids are computed in-kernel from the
    doubled axis-feature sets (xi/yi = 1), differenced into the
    coordinate derivative vectors (the reference's ninepack,
    twining.h:236-238), and fed to the shared K-tap resolve."""
    t = pl.program_id(0)
    ext = stride >= TILE_ROW_INTS_EXT
    win = _load_tile_window(tiles_ref, coeff_ref, scratch, t=t,
                            stride=stride, wc=wc, nch=nch, nt=nt,
                            dbuf=dbuf)
    oyf = tiles_ref[t * stride + 4].astype(jnp.float32)
    oxf = tiles_ref[t * stride + 5].astype(jnp.float32)
    f = faces_ref[t]
    bm = [bm_ref[f, k] for k in range(9)]
    eps = eps_ref[0]

    def row_body(r, _):
        sl8 = pl.ds(r * 8, 8)
        sx0, sy0 = _inline_coords_rb(xf_ref, yf_ref, bm, sl8,
                                     tmode=tmode, consts=consts,
                                     smode=smode)
        sxb, syb = _inline_coords_rb(xf_ref, yf_ref, bm, sl8,
                                     tmode=tmode, consts=consts,
                                     xi=1, smode=smode)
        sxc, syc = _inline_coords_rb(xf_ref, yf_ref, bm, sl8,
                                     tmode=tmode, consts=consts,
                                     yi=1, smode=smode)
        dux = sxb - sx0
        duy = syb - sy0
        dvx = sxc - sx0
        dvy = syc - sy0
        sx = sx0 + eps - oxf
        sy = sy0 - oyf

        rb0 = cb0 = bands = a_f = b_f = None
        if wc.shear_q:
            base = t * stride + TILE_ROW_INTS + 4 * r
            rb0 = pl.multiple_of(tiles_ref[base], 8)
            cb0 = pl.multiple_of(tiles_ref[base + 1], 128)
            bands, a_f, b_f = _shear_bands(
                win, degree=degree, wc=wc, nch=nch, rb0=rb0, cb0=cb0,
                a_fix=tiles_ref[base + 2], b_fix=tiles_ref[base + 3],
                col0=tiles_ref[t * stride + 5])
        elif ext:
            rb0 = pl.multiple_of(
                tiles_ref[t * stride + TILE_ROW_INTS + 2 * r], 8)
            cb0 = pl.multiple_of(
                tiles_ref[t * stride + TILE_ROW_INTS + 2 * r + 1], 128)

        if wc.u_span and n_taps > 1:
            if wc.shear_q:
                acc = _resolve_sheared_union(
                    sx, sy, dux, duy, dvx, dvy, spread_ref, n_taps,
                    bands, a_f, b_f, degree=degree, wc=wc, nch=nch,
                    cb0=cb0, col0=tiles_ref[t * stride + 5],
                    grid=grid)
            else:
                acc = _eval_row_block_union(
                    sx, sy, dux, duy, dvx, dvy, spread_ref, n_taps,
                    win, degree=degree, wc=wc, nch=nch, rb0=rb0,
                    cb0=cb0, grid=grid)
            _emit_rows(out_ref, r, acc, interleave=interleave)
            return _

        def tap_body(ti, acc):
            cx_t = spread_ref[ti * 3]
            cy_t = spread_ref[ti * 3 + 1]
            w_t = spread_ref[ti * 3 + 2]
            sxt = sx + cx_t * dux + cy_t * dvx
            syt = sy + cx_t * duy + cy_t * dvy
            if wc.shear_q:
                vals = _resolve_sheared(
                    sxt, syt, bands, a_f, b_f, degree=degree, wc=wc,
                    nch=nch, cb0=cb0, col0=tiles_ref[t * stride + 5])
            else:
                vals = _eval_row_block(sxt, syt, win, degree=degree,
                                       wc=wc, nch=nch, rb0=rb0,
                                       cb0=cb0)
            return tuple(a + w_t * v for a, v in zip(acc, vals))

        acc0 = tuple(jnp.zeros((8, TILE_W), jnp.float32)
                     for _c in range(nch))
        acc = jax.lax.fori_loop(0, n_taps, tap_body, acc0)
        _emit_rows(out_ref, r, acc, interleave=interleave)
        return _

    jax.lax.fori_loop(0, TILE_H // 8, row_body, 0)


@functools.partial(jax.jit, static_argnames=("degree", "wc",
                                             "interpret", "n_taps",
                                             "tmode", "consts",
                                             "smode", "grid",
                                             "interleave"))
def resample_inline_twined_into(canvas: jnp.ndarray,
                                coeff: jnp.ndarray,
                                tiles: jnp.ndarray,
                                faces: jnp.ndarray,
                                xfeat: jnp.ndarray,
                                yfeat: jnp.ndarray,
                                bmats: jnp.ndarray, spread, eps, *,
                                degree: int, n_taps: int, tmode: str,
                                consts: tuple, smode: str = "sph",
                                wc: WindowClass = LOCAL,
                                interpret: bool = False,
                                grid=None,
                                interleave: bool = False
                                ) -> jnp.ndarray:
    """resample_twined_into with the coordinate chain (center + both
    derivative grids) fused into the kernel. ``xfeat``/``yfeat`` carry
    DOUBLED feature sets - [center features..., DERIV_BIAS-biased
    features...] (see _inline_coords_rb); other operands as in
    resample_inline_into, plus the flat (K*3,) ``spread``."""
    nch, hp, wp = coeff.shape
    ha, wa = aligned_dims(hp, wp, wc)
    if (ha, wa) != (hp, wp):
        coeff = jnp.pad(coeff, ((0, 0), (0, ha - hp), (0, wa - wp)),
                        mode="edge")
        nch, hp, wp = coeff.shape
    bf16 = coeff.dtype == jnp.bfloat16
    dbuf = _dbuf_ok(wc, nch, coeff.dtype.itemsize) and not (interpret or FORCE_INTERPRET)
    nt, stride = tiles.shape
    if wc.shear_q:
        assert stride == TILE_ROW_INTS_SHEAR, \
            "sheared classes need row_block_shear extended tile rows"

    scratch = [
        pltpu.VMEM(((2,) if dbuf else ()) +
                   (nch, wc.win_h, wc.win_w), coeff.dtype),
        pltpu.SemaphoreType.DMA((2,)) if dbuf
        else pltpu.SemaphoreType.DMA,
    ]
    if bf16:
        scratch.append(pltpu.VMEM((nch, wc.win_h, wc.win_w),
                                  jnp.float32))

    nfx = xfeat.shape[0]
    nfy = yfeat.shape[0]
    in_specs = [
        pl.BlockSpec((nfx, 8, TILE_W),
                     lambda t, o, f, s: (0, 0, o[t * stride + 3]),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nfy, TILE_H, 128),
                     lambda t, o, f, s: (0, o[t * stride + 2], 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if interleave:
        assert nch == 3 and canvas.ndim == 2, \
            "interleave: 3-channel (ph, 3*pw) canvas"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(
            (TILE_H, 3 * TILE_W),
            lambda t, o, f, s: (o[t * stride + 2],
                                o[t * stride + 3]),
            memory_space=pltpu.VMEM) if interleave else pl.BlockSpec(
            (nch, TILE_H, TILE_W),
            lambda t, o, f, s: (0, o[t * stride + 2],
                                o[t * stride + 3]),
            memory_space=pltpu.VMEM)),
        scratch_shapes=scratch,
    )
    kern = functools.partial(_inline_twined_kernel_into,
                             degree=degree, wc=wc, nch=nch,
                             n_taps=n_taps, nt=nt, dbuf=dbuf,
                             stride=stride, tmode=tmode,
                             consts=consts, smode=smode, grid=grid,
                             interleave=interleave)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(canvas.shape, jnp.float32),
        input_output_aliases={8: 0},  # canvas (incl. prefetch args)
        interpret=interpret or FORCE_INTERPRET,
    )(tiles.reshape(-1), faces, spread, xfeat, yfeat, bmats,
      jnp.asarray(eps, jnp.float32).reshape(1), coeff, canvas)


# ---------------------------------------------------------------------------
# twining variant: the K-tap supersampling filter fused into the kernel
# (the reference's twine_t / synopsis_t, twining.h:72-263, linearized in
# coordinate space: tap coords = center + cx*du + cy*dv with du/dv the
# differenced coordinate derivatives - the reference itself linearizes
# in ray space with the same differencing)
# ---------------------------------------------------------------------------

def _twined_kernel_into(tiles_ref, spread_ref,  # scalar prefetch
                        sx_ref, sy_ref,
                        dux_ref, duy_ref, dvx_ref, dvy_ref,
                        *rest,
                        degree: int, wc: WindowClass, nch: int,
                        n_taps: int, nt: int, dbuf: bool,
                        stride: int, merge: bool = False,
                        grid=None, tapsel: bool = False,
                        interleave: bool = False):
    # merge: see _resample_kernel_into - mask + canvas-in blocks for
    # per-pixel overlay of face-boundary tiles
    # grid: static (kx, ky) when the spread is a separable tensor
    # grid and the pass's tiles have dvx == 0 (WindowClass.sep); the
    # spread_ref layout is then [cxs(kx), cys(ky), w(ky*kx)] instead
    # of (n_taps, 3) triplets
    # tapsel: champion-routed per-pixel tap weights. An extra
    # (n_taps, TILE_H, TILE_W) int32 champion-id block rides in ahead
    # of the coefficients and spread_ref carries the facet id at
    # [3*n_taps]; tap ti's weight becomes w_ti * (champ[ti] == fi)
    # per pixel, so one union-tap kernel instance per facet replaces
    # the K-tap x F-facet per-tap loop on synopsis seam tiles (the
    # voronoi champion select regrouped facet-major; the reference
    # evaluates the same sum tap-major, envutil_payload.cc:611-691).
    champ_ref = None
    if tapsel:
        assert not merge and grid is None
        champ_ref, coeff_ref, _canvas_ref, out_ref, *scratch = rest
        mask_ref = cin_ref = None
    elif merge:
        mask_ref, coeff_ref, cin_ref, out_ref, *scratch = rest
    else:
        mask_ref = cin_ref = None
        coeff_ref, _canvas_ref, out_ref, *scratch = rest
    win_ref, sem = scratch[0], scratch[1]
    f32_ref = scratch[2] if len(scratch) > 2 else None
    """Compact-grid twined kernel: one grid step per listed tile,
    writing into the donated canvas. Taps evaluate through
    _eval_row_block; the classifier's margin budgets
    (tile_stats_range) guarantee every tap footprint fits, so the
    planner's precomputed per-row-block origins (extended tile rows)
    are shared by all taps."""
    t = pl.program_id(0)
    ext = stride >= TILE_ROW_INTS_EXT

    if dbuf:
        def get_dma(slot, ti):
            oy_i = pl.multiple_of(tiles_ref[ti * stride + 4], 8)
            ox_i = pl.multiple_of(tiles_ref[ti * stride + 5], 128)
            return pltpu.make_async_copy(
                coeff_ref.at[:, pl.ds(oy_i, wc.win_h),
                             pl.ds(ox_i, wc.win_w)],
                win_ref.at[slot], sem.at[slot])

        slot = jax.lax.rem(t, 2)

        @pl.when(t == 0)
        def _warm():
            get_dma(0, 0).start()

        @pl.when(t + 1 < nt)
        def _prefetch():
            get_dma(jax.lax.rem(t + 1, 2), t + 1).start()

        get_dma(slot, t).wait()
        win = win_ref.at[slot]
    else:
        oy0 = pl.multiple_of(tiles_ref[t * stride + 4], 8)
        ox0 = pl.multiple_of(tiles_ref[t * stride + 5], 128)
        copy = pltpu.make_async_copy(
            coeff_ref.at[:, pl.ds(oy0, wc.win_h), pl.ds(ox0, wc.win_w)],
            win_ref, sem)
        copy.start()
        copy.wait()
        win = win_ref

    if f32_ref is not None:
        for ch in range(nch):
            f32_ref[ch] = win[ch].astype(jnp.float32)
        win = f32_ref

    oyf = tiles_ref[t * stride + 4].astype(jnp.float32)
    oxf = tiles_ref[t * stride + 5].astype(jnp.float32)

    fi_s = (spread_ref[n_taps * 3].astype(jnp.int32) if tapsel
            else None)

    def eval_taps(r, sl):
        sx = sx_ref[sl] - oxf
        sy = sy_ref[sl] - oyf
        dux = dux_ref[sl]
        duy = duy_ref[sl]
        dvx = dvx_ref[sl]
        dvy = dvy_ref[sl]
        tap_w = None
        if tapsel:
            tap_w = lambda ti: (champ_ref[ti, sl[0], :]
                                == fi_s).astype(jnp.float32)
        rb0 = cb0 = bands = a_f = b_f = None
        if wc.shear_q:
            base = t * stride + TILE_ROW_INTS + 4 * r
            rb0 = pl.multiple_of(tiles_ref[base], 8)
            cb0 = pl.multiple_of(tiles_ref[base + 1], 128)
            # the bands are tap-invariant: one build serves all taps
            bands, a_f, b_f = _shear_bands(
                win, degree=degree, wc=wc, nch=nch, rb0=rb0, cb0=cb0,
                a_fix=tiles_ref[base + 2], b_fix=tiles_ref[base + 3],
                col0=tiles_ref[t * stride + 5])
        elif ext:
            rb0 = pl.multiple_of(
                tiles_ref[t * stride + TILE_ROW_INTS + 2 * r], 8)
            cb0 = pl.multiple_of(
                tiles_ref[t * stride + TILE_ROW_INTS + 2 * r + 1], 128)

        if wc.u_span and n_taps > 1:
            # union-tap path: gathers shared across taps, per-tap
            # routing on the VPU (K-independent gather count)
            if wc.shear_q:
                return _resolve_sheared_union(
                    sx, sy, dux, duy, dvx, dvy, spread_ref, n_taps,
                    bands, a_f, b_f, degree=degree, wc=wc, nch=nch,
                    cb0=cb0, col0=tiles_ref[t * stride + 5],
                    grid=grid, tap_w=tap_w)
            return _eval_row_block_union(
                sx, sy, dux, duy, dvx, dvy, spread_ref, n_taps, win,
                degree=degree, wc=wc, nch=nch, rb0=rb0, cb0=cb0,
                grid=grid, tap_w=tap_w)

        def tap_body(ti, acc):
            cx_t = spread_ref[ti * 3]
            cy_t = spread_ref[ti * 3 + 1]
            w_t = spread_ref[ti * 3 + 2]
            if tap_w is not None:
                w_t = w_t * tap_w(ti)
            sxt = sx + cx_t * dux + cy_t * dvx
            syt = sy + cx_t * duy + cy_t * dvy
            if wc.shear_q:
                vals = _resolve_sheared(
                    sxt, syt, bands, a_f, b_f, degree=degree, wc=wc,
                    nch=nch, cb0=cb0, col0=tiles_ref[t * stride + 5])
            else:
                vals = _eval_row_block(sxt, syt, win, degree=degree,
                                       wc=wc, nch=nch, rb0=rb0,
                                       cb0=cb0)
            return tuple(a + w_t * v for a, v in zip(acc, vals))

        acc0 = tuple(jnp.zeros((8, TILE_W), jnp.float32)
                     for _c in range(nch))
        return jax.lax.fori_loop(0, n_taps, tap_body, acc0)

    def row_body(r, _):
        sl = (pl.ds(r * 8, 8), slice(None))
        if merge:
            # skip the K-tap gather work for row-blocks this pass does
            # not dominate at all (see _resample_kernel_into)
            mf = mask_ref[sl]
            any_m = jnp.any(mf > 0.5)

            @pl.when(any_m)
            def _dominated():
                acc = eval_taps(r, sl)
                _emit_rows(out_ref, r, acc, interleave=interleave,
                           mask_f32=mf, cin_ref=cin_ref)

            @pl.when(jnp.logical_not(any_m))
            def _pass_through():
                _emit_rows_passthrough(out_ref, r, cin_ref,
                                       interleave=interleave,
                                       nch=nch)
        elif tapsel:
            # skip the whole gather chain for row-blocks no tap
            # champions for this facet (band tiles are typically
            # majority-owned by one facet)
            m = jnp.any(champ_ref[:, pl.ds(r * 8, 8), :] == fi_s)

            @pl.when(m)
            def _championed():
                acc = eval_taps(r, sl)
                _emit_rows(out_ref, r, acc, interleave=interleave)

            @pl.when(jnp.logical_not(m))
            def _unchampioned():
                _emit_rows_zero(out_ref, r, interleave=interleave,
                                nch=nch)
        else:
            acc = eval_taps(r, sl)
            _emit_rows(out_ref, r, acc, interleave=interleave)
        return _

    jax.lax.fori_loop(0, TILE_H // 8, row_body, 0)


@functools.partial(jax.jit, static_argnames=("degree", "n_taps", "wc",
                                             "interpret", "grid",
                                             "interleave"))
def resample_twined_into(canvas, coeff, sx, sy, dux, duy, dvx, dvy,
                         tiles, spread, *, degree: int, n_taps: int,
                         wc: WindowClass = LOCAL,
                         interpret: bool = False,
                         merge_mask: jnp.ndarray = None,
                         grid=None, champ=None,
                         interleave: bool = False) -> jnp.ndarray:
    """Compact-grid twined resampling into a donated canvas (see
    resample_planar_into for the tile-row layout and merge_mask).
    ``grid`` (static (kx, ky), requires wc.sep) switches to the
    separable tensor-grid routing; ``spread`` is then the flat
    [cxs, cys, w row-major] layout.

    ``champ`` (canvas-shaped (n_taps, H, W) int32 champion-id planes)
    switches to champion-routed per-pixel tap weights: ``spread`` must
    then carry the facet id appended at [3*n_taps], and tap ti
    contributes only where ``champ[ti] == fi`` (see _twined_kernel_into
    tapsel). Mutually exclusive with merge_mask and grid."""
    nch, hp, wp = coeff.shape
    ha, wa = aligned_dims(hp, wp, wc)
    if (ha, wa) != (hp, wp):
        coeff = jnp.pad(coeff, ((0, 0), (0, ha - hp), (0, wa - wp)),
                        mode="edge")
        nch, hp, wp = coeff.shape
    nt, stride = tiles.shape
    if wc.shear_q:
        assert stride == TILE_ROW_INTS_SHEAR, \
            "sheared classes need row_block_shear extended tile rows"
    bf16 = coeff.dtype == jnp.bfloat16
    dbuf = _dbuf_ok(wc, nch, coeff.dtype.itemsize) and not (interpret or FORCE_INTERPRET)

    scratch = [
        pltpu.VMEM(((2,) if dbuf else ()) +
                   (nch, wc.win_h, wc.win_w), coeff.dtype),
        pltpu.SemaphoreType.DMA((2,)) if dbuf
        else pltpu.SemaphoreType.DMA,
    ]
    if bf16:
        scratch.append(pltpu.VMEM((nch, wc.win_h, wc.win_w),
                                  jnp.float32))

    cmap = lambda t, o, s: (o[t * stride], o[t * stride + 1])
    in_block = pl.BlockSpec((TILE_H, TILE_W), cmap,
                            memory_space=pltpu.VMEM)
    merge = merge_mask is not None
    tapsel = champ is not None
    assert not (tapsel and (merge or grid is not None))
    if interleave:
        assert nch == 3 and canvas.ndim == 2, \
            "interleave: 3-channel (ph, 3*pw) canvas"
    canvas_block = (pl.BlockSpec(
        (TILE_H, 3 * TILE_W),
        lambda t, o, s: (o[t * stride + 2], o[t * stride + 3]),
        memory_space=pltpu.VMEM) if interleave else pl.BlockSpec(
        (nch, TILE_H, TILE_W),
        lambda t, o, s: (0, o[t * stride + 2], o[t * stride + 3]),
        memory_space=pltpu.VMEM))
    if tapsel:
        in_specs = ([in_block] * 6
                    + [pl.BlockSpec(
                           (n_taps, TILE_H, TILE_W),
                           lambda t, o, s: (0, o[t * stride + 2],
                                            o[t * stride + 3]),
                           memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)])
        operands = (tiles.reshape(-1), spread, sx, sy, dux, duy, dvx,
                    dvy, champ, coeff, canvas)
        alias = {10: 0}
    elif merge:
        in_specs = ([in_block] * 7
                    + [pl.BlockSpec(memory_space=pl.ANY),
                       canvas_block])
        operands = (tiles.reshape(-1), spread, sx, sy, dux, duy, dvx,
                    dvy, merge_mask, coeff, canvas)
        alias = {10: 0}
    else:
        in_specs = ([in_block] * 6
                    + [pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)])
        operands = (tiles.reshape(-1), spread, sx, sy, dux, duy, dvx,
                    dvy, coeff, canvas)
        alias = {9: 0}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=canvas_block,
        scratch_shapes=scratch,
    )
    kern = functools.partial(_twined_kernel_into, degree=degree,
                             wc=wc, nch=nch, n_taps=n_taps, nt=nt,
                             dbuf=dbuf, stride=stride, merge=merge,
                             grid=grid, tapsel=tapsel,
                             interleave=interleave)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(canvas.shape, jnp.float32),
        input_output_aliases=alias,
        interpret=interpret or FORCE_INTERPRET,
    )(*operands)


def _twined_kernel(origins_ref, spread_ref,     # scalar prefetch
                   sx_ref, sy_ref,              # center coords
                   dux_ref, duy_ref, dvx_ref, dvy_ref,
                   coeff_ref, out_ref, win_ref, sem,
                   *, degree: int, wc: WindowClass, nch: int,
                   ntx: int, n_taps: int, cmax_x: float,
                   cmax_y: float):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tid = ti * ntx + tj
    oy = pl.multiple_of(origins_ref[tid * 3], 8)
    ox = pl.multiple_of(origins_ref[tid * 3 + 1], 128)
    active = origins_ref[tid * 3 + 2]

    @pl.when(active != 0)
    def _do_copy():
        copy = pltpu.make_async_copy(
            coeff_ref.at[:, pl.ds(oy, wc.win_h), pl.ds(ox, wc.win_w)],
            win_ref, sem)
        copy.start()
        copy.wait()

    n1 = degree + 1
    off = degree // 2
    oyf = oy.astype(jnp.float32)
    oxf = ox.astype(jnp.float32)

    def row_body(r, carry):
        sl = (pl.ds(r * 8, 8), slice(None))
        sx = sx_ref[sl] - oxf
        sy = sy_ref[sl] - oyf
        dux = dux_ref[sl]
        duy = duy_ref[sl]
        dvx = dvx_ref[sl]
        dvy = dvy_ref[sl]

        # candidate bases covering all taps (static margin bounds)
        mx = cmax_x * jnp.abs(dux) + cmax_y * jnp.abs(dvx)
        my = cmax_x * jnp.abs(duy) + cmax_y * jnp.abs(dvy)
        by_lo, _unused_ty = _split(sy - my, degree)
        rb0 = jnp.min(by_lo - off)
        rb0 = jnp.clip((rb0 // 8) * 8, 0, wc.win_h - 8 * wc.cand_r)
        rb0 = pl.multiple_of(rb0, 8)
        bx_lo, _unused_tx = _split(sx - mx, degree)
        cb0 = jnp.min(bx_lo - off)
        cb0 = jnp.clip((cb0 // 128) * 128, 0,
                       wc.win_w - 128 * wc.cand_c)
        cb0 = pl.multiple_of(cb0, 128)

        def tap_body(t, acc):
            cx_t = spread_ref[t * 3]
            cy_t = spread_ref[t * 3 + 1]
            w_t = spread_ref[t * 3 + 2]
            sxt = sx + cx_t * dux + cy_t * dvx
            syt = sy + cx_t * duy + cy_t * dvy

            sely, ty = _split(syt, degree)
            by = sely - off
            ly = jnp.clip(by - rb0, 0, 8 * wc.cand_r - 1 - degree)
            wy = _weights_poly(ty, degree)
            selx, tx = _split(sxt, degree)
            bx = selx - off
            bxc = jnp.broadcast_to(
                jnp.min(bx, axis=0, keepdims=True), (8, TILE_W))
            lxc = jnp.clip(bxc - cb0, 0, 128 * wc.cand_c - 1)
            # exact tap weights routed by the sublane drift (see
            # _resample_kernel)
            delta = bx - bxc
            wx = _weights_poly(tx, degree)
            wk = []
            for k in range(wc.k_taps):
                acc_w = None
                for j in range(n1):
                    if k - j < 0:
                        continue
                    acc_w = jnp.where(delta == (k - j), wx[j],
                                      0.0 if acc_w is None else acc_w)
                wk.append(acc_w if acc_w is not None
                          else jnp.zeros((8, TILE_W), jnp.float32))
            wjk = [[wy[j] * wk[k] for k in range(wc.k_taps)]
                   for j in range(n1)]
            rr = [(ly + j) & 7 for j in range(n1)]
            qb = [(ly + j) >> 3 for j in range(n1)]
            qcs, rcs = [], []
            for k in range(wc.k_taps):
                cxi = jnp.minimum(lxc + k, 128 * wc.cand_c - 1)
                qcs.append(cxi >> 7)
                rcs.append(cxi & 127)

            for ch in range(nch):
                blocks = [
                    [win_ref[ch, pl.ds(rb0 + 8 * b, 8),
                             pl.ds(cb0 + 128 * cc, 128)]
                     for cc in range(wc.cand_c)]
                    for b in range(wc.cand_r)
                ]
                val = jnp.zeros((8, TILE_W), jnp.float32)
                for k in range(wc.k_taps):
                    qc = qcs[k]
                    rc = rcs[k]
                    tb = []
                    for b in range(wc.cand_r):
                        v = jnp.take_along_axis(blocks[b][0], rc,
                                                axis=1)
                        for cc in range(1, wc.cand_c):
                            g = jnp.take_along_axis(blocks[b][cc], rc,
                                                    axis=1)
                            v = jnp.where(qc == cc, g, v)
                        tb.append(v)
                    for j in range(n1):
                        v = jnp.take_along_axis(tb[0], rr[j], axis=0)
                        for b in range(1, wc.cand_r):
                            g = jnp.take_along_axis(tb[b], rr[j],
                                                    axis=0)
                            v = jnp.where(qb[j] == b, g, v)
                        val = val + wjk[j][k] * v
                # static-index accumulation (scatter is unsupported in
                # Mosaic): the carry is a tuple of per-channel vregs
                acc = tuple(a + w_t * val if i == ch else a
                            for i, a in enumerate(acc))
            return acc

        acc0 = tuple(jnp.zeros((8, TILE_W), jnp.float32)
                     for _c in range(nch))
        acc = jax.lax.fori_loop(0, n_taps, tap_body, acc0)
        for ch in range(nch):
            out_ref[ch, pl.ds(r * 8, 8), :] = acc[ch]
        return carry

    @pl.when(active != 0)
    def _do_rows():
        jax.lax.fori_loop(0, TILE_H // 8, row_body, 0)


@functools.partial(jax.jit,
                   static_argnames=("degree", "wc", "n_taps", "cmax_x",
                                    "cmax_y", "interpret"))
def resample_twined(coeff, sx, sy, dux, duy, dvx, dvy, origins,
                    spread, *, degree: int, n_taps: int,
                    cmax_x: float, cmax_y: float,
                    wc: WindowClass = LOCAL,
                    interpret: bool = False) -> jnp.ndarray:
    """Twined resampling: evaluates the spline at n_taps deflected
    positions per pixel (tap t at center + spread[3t]*du +
    spread[3t+1]*dv, weighted by spread[3t+2]) and accumulates.
    ``spread`` is a flat float32 array (n_taps*3,) with the bias
    already folded in; (cmax_x, cmax_y) are static bounds on |cx|,|cy|
    used for the candidate windows."""
    nch, hp, wp = coeff.shape
    ha, wa = aligned_dims(hp, wp, wc)
    if (ha, wa) != (hp, wp):
        coeff = jnp.pad(coeff, ((0, 0), (0, ha - hp), (0, wa - wp)),
                        mode="edge")
        nch, hp, wp = coeff.shape
    h, w = sx.shape
    nty, ntx = h // TILE_H, w // TILE_W

    tile = lambda i, j, o, s: (i, j)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec((TILE_H, TILE_W), tile,
                               memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((nch, TILE_H, TILE_W),
                               lambda i, j, o, s: (0, i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nch, wc.win_h, wc.win_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kern = functools.partial(_twined_kernel, degree=degree, wc=wc,
                             nch=nch, ntx=ntx, n_taps=n_taps,
                             cmax_x=cmax_x, cmax_y=cmax_y)
    if origins.ndim == 2:
        if origins.shape[1] == 2:  # no active column: all tiles on
            origins = jnp.concatenate(
                [origins, jnp.ones((origins.shape[0], 1), jnp.int32)],
                axis=1)
        origins = origins.reshape(-1)
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nch, h, w), jnp.float32),
        interpret=interpret or FORCE_INTERPRET,
    )(origins, spread, sx, sy, dux, duy, dvx, dvy, coeff)


# ---------------------------------------------------------------------------
# tile classification (host side, from per-vreg coordinate statistics
# computed by one cheap XLA reduction)
# ---------------------------------------------------------------------------

@jax.jit
def tile_stats_range(sx_lo, sx_hi, sy_lo, sy_hi):
    """tile_stats over per-pixel coordinate *ranges* (for twining: the
    tap footprint [c - margin, c + margin])."""
    h, w = sx_lo.shape

    def v(a):
        return a.reshape(h // 8, 8, w // 128, 128)

    drift = (jnp.max(v(sx_hi), axis=1)
             - jnp.min(v(sx_lo), axis=1)).max(axis=-1)
    return (jnp.min(v(sy_lo), axis=(1, 3)),
            jnp.max(v(sy_hi), axis=(1, 3)),
            jnp.min(v(sx_lo), axis=(1, 3)),
            jnp.max(v(sx_hi), axis=(1, 3)), drift)


def masked_coord_fill(a: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Replace invalid pixels of an (h, w) coordinate plane with their
    (8, 128) vreg's masked least-squares *linear fit along lanes*
    evaluated at their own lane (vregs with no valid pixel fall back
    to their (TILE_H, TILE_W) tile's masked mean). Running both the
    classifier statistics AND the kernel on the filled plane makes the
    class budgets bound essentially only the valid pixels: within a
    vreg the coordinates are near-affine in the lane index (that is
    the premise of the window classes), so fit-predicted fills extend
    per-lane sublane spans, vreg spans and the shear-fit residual band
    by at most the fit residual - unlike a constant fill, which breaks
    the vreg's linearity outright and busts the budgets. A filled
    value below a lane's valid minimum merely lowers the kernel's
    per-lane tap base (_eval_row_block's bxc); the drift budget is
    computed on the same filled plane, so routing stays exact. Used by
    the face-boundary merge passes, whose kernels only keep the pixels
    their face dominates."""
    h, w = a.shape
    va = a.reshape(h // 8, 8, w // 128, 128)
    vm = mask.reshape(h // 8, 8, w // 128, 128).astype(a.dtype)
    # invalid pixels may hold inf/NaN (backward rays, grazing planar
    # projections); zero them before the masked sums so 0 * NaN never
    # poisons the fit
    va = jnp.where(vm > 0, va, 0.0)
    lane = (jnp.arange(128, dtype=a.dtype) - 63.5)  # centered lanes
    cnt = vm.sum(axis=(1, 3), keepdims=True)
    safe = jnp.maximum(cnt, 1.0)
    sa = (vm * va).sum(axis=(1, 3), keepdims=True)
    mean_a = sa / safe
    sl = (vm * lane).sum(axis=(1, 3), keepdims=True)
    mean_l = sl / safe
    dl = lane - mean_l
    da = va - mean_a
    var = (vm * dl * dl).sum(axis=(1, 3), keepdims=True)
    cov = (vm * dl * da).sum(axis=(1, 3), keepdims=True)
    b = jnp.where(var > 0.5, cov / jnp.maximum(var, 0.5), 0.0)
    # clamp the prediction to the vreg's valid range: when the valid
    # pixels cluster in a few lanes the fit extrapolates wildly over
    # the rest, widening the span budgets past what the valid pixels
    # need - the clamp caps every fill inside the valid span
    vmin = jnp.where(vm > 0, va, jnp.inf).min(axis=(1, 3),
                                              keepdims=True)
    vmax = jnp.where(vm > 0, va, -jnp.inf).max(axis=(1, 3),
                                               keepdims=True)
    vfit = jnp.clip(mean_a + b * dl, vmin, vmax)
    nby, nbx = h // TILE_H, w // TILE_W
    rb, lb = TILE_H // 8, TILE_W // 128
    tcnt = cnt.reshape(nby, rb, 1, nbx, lb, 1).sum(
        axis=(1, 4), keepdims=True)
    ts = sa.reshape(nby, rb, 1, nbx, lb, 1).sum(
        axis=(1, 4), keepdims=True)
    tmean = jnp.broadcast_to(ts / jnp.maximum(tcnt, 1.0),
                             (nby, rb, 1, nbx, lb, 1)
                             ).reshape(cnt.shape)
    fill = jnp.where(cnt > 0, vfit, tmean)
    return jnp.where(vm > 0, va, fill).reshape(h, w)


@functools.partial(jax.jit, static_argnames=("degree",))
def tile_stats_fit(sx: jnp.ndarray, sy: jnp.ndarray, degree: int):
    """tile_stats plus, per (8, 128) vreg, a quantized least-squares
    linear fit of the integer tap-base row ``by`` against the tap-base
    column ``bx`` (the shear line of the sheared window classes) and
    the residual bounds of that fit evaluated at both horizontal tap
    endpoints. Returns the 5 tile_stats entries followed by
    (a_fix, b_fix, rlo, rhi) int32 arrays of vreg shape."""
    h, w = sx.shape

    def v(a):
        return a.reshape(h // 8, 8, w // 128, 128)

    vx, vy = v(sx), v(sy)
    drift = (jnp.max(vx, axis=1) - jnp.min(vx, axis=1)).max(axis=-1)
    base = (jnp.min(vy, axis=(1, 3)), jnp.max(vy, axis=(1, 3)),
            jnp.min(vx, axis=(1, 3)), jnp.max(vx, axis=(1, 3)), drift)

    off = degree // 2
    half = 0.0 if degree % 2 else 0.5
    by = jnp.floor(vy + half) - off
    bx = jnp.floor(vx + half) - off
    mx = bx.mean(axis=(1, 3), keepdims=True)
    my = by.mean(axis=(1, 3), keepdims=True)
    var = ((bx - mx) ** 2).mean(axis=(1, 3))
    cov = ((bx - mx) * (by - my)).mean(axis=(1, 3))
    b = jnp.where(var > 1e-3, cov / jnp.maximum(var, 1e-3), 0.0)
    b = jnp.clip(b, -8.0, 8.0)
    b_fix = jnp.round(b * B_FIX).astype(jnp.int32)
    bq = b_fix.astype(jnp.float32) / B_FIX
    # per-vreg centroids (axes: row-block, sublane=1, lane-block,
    # lane=1) -> (row-block, lane-block), so each vreg's intercept is
    # its own least-squares fit, not lane-block 0's
    a = my[:, 0, :, 0] - bq * mx[:, 0, :, 0]
    a_fix = jnp.round(a * A_FIX).astype(jnp.int32)
    aq = a_fix.astype(jnp.float32) / A_FIX
    aqx = aq[:, None, :, None]
    bqx = bq[:, None, :, None]
    e0 = by - jnp.floor(aqx + bqx * bx)
    e1 = by - jnp.floor(aqx + bqx * (bx + degree))
    rlo = jnp.minimum(e0, e1).min(axis=(1, 3)).astype(jnp.int32)
    rhi = jnp.maximum(e0, e1).max(axis=(1, 3)).astype(jnp.int32)
    return base + (a_fix, b_fix, rlo, rhi)


@functools.partial(jax.jit, static_argnames=("degree",))
def tile_stats_fit_range(sx, sy, mx, my, degree: int, dvx=None):
    """tile_stats_range plus the shear fit of tile_stats_fit, for the
    twined kernel: range stats cover the full per-pixel tap footprint
    [c - margin, c + margin], the fit is computed on the center
    coordinates and its residual bounds widened by the per-vreg margin
    maxima (rows: my; columns: mx scaled by the fitted slope) plus the
    floor rounding slack - so every deflected tap's residual is
    guaranteed inside the shipped bands.

    ``dvx`` adds stat 10: the per-vreg float32 max of |dvx| as scaled
    by the caller - the admission measure of the separable tensor-grid
    classes (WindowClass.sep). The planner passes
    ``|dvx| * cmax_y / (4 ulp of the table width)`` so classify_tiles'
    ``<= 1`` test bounds the x-deflection the sep kernel drops at 4
    ulps of the coordinate scale: for an axis-aligned warp the
    analytic dvx is zero and the XLA pass's value is pure float noise
    (~0.5 ulp of width measured), the same error class as the two
    floor() evaluations the shear budgets already carry slack for."""
    rng = tile_stats_range(sx - mx, sx + mx, sy - my, sy + my)
    fit = tile_stats_fit(sx, sy, degree)
    h, w = sx.shape

    def v(a):
        return a.reshape(h // 8, 8, w // 128, 128)

    mxv = jnp.max(v(mx), axis=(1, 3))
    myv = jnp.max(v(my), axis=(1, 3))
    a_fix, b_fix, rlo, rhi = fit[5], fit[6], fit[7], fit[8]
    bq = jnp.abs(b_fix.astype(jnp.float32)) / B_FIX
    # deflection moves the row base by up to floor(my)+1 and the tap
    # column by up to floor(mx)+1 (each its own floor)
    slack = jnp.ceil(myv + bq * (mxv + 1.0)).astype(jnp.int32) + 2
    # stat 9: per-vreg max of the per-PIXEL tap row-footprint span in
    # integer row bases - the u_span budget of the union-tap kernel
    # (every tap's row base at one pixel lies between the two splits)
    half = 0.0 if degree % 2 else 0.5
    rspan = (jnp.floor(sy + my + half)
             - jnp.floor(sy - my + half)).astype(jnp.int32)
    rspan_v = jnp.max(v(rspan), axis=(1, 3))
    out = rng + (a_fix, b_fix, rlo - slack, rhi + slack, rspan_v)
    if dvx is not None:
        out = out + (jnp.max(jnp.abs(v(dvx)), axis=(1, 3)),)
    return out


@jax.jit
def tile_stats(sx: jnp.ndarray, sy: jnp.ndarray):
    """Per-vreg (8x128) statistics needed by classify_tiles."""
    h, w = sx.shape
    vx = sx.reshape(h // 8, 8, w // 128, 128)
    vy = sy.reshape(h // 8, 8, w // 128, 128)
    # per-lane sublane drift of x (the K-tap budget consumer)
    drift = (jnp.max(vx, axis=1) - jnp.min(vx, axis=1)).max(axis=-1)
    return (jnp.min(vy, axis=(1, 3)), jnp.max(vy, axis=(1, 3)),
            jnp.min(vx, axis=(1, 3)), jnp.max(vx, axis=(1, 3)), drift)


def classify_tiles(stats, hp: int, wp: int, degree: int,
                   wc: WindowClass = LOCAL):
    """Host-side: per-tile window origins + fast mask. A tile is fast
    when its tap footprint fits one window and every vreg fits the
    class budgets (row candidates, lane candidates, tap columns)."""
    min_y, max_y, min_x, max_x, drift = [np.asarray(s)
                                         for s in stats[:5]]
    hp, wp = aligned_dims(hp, wp, wc)  # match the wrapper's padding
    nvy, nvx = min_y.shape
    nty, ntx = nvy // (TILE_H // 8), nvx // (TILE_W // 128)
    off = degree // 2

    def tile_view(a):
        return a.reshape(nty, TILE_H // 8, ntx, TILE_W // 128)

    t_min_y = tile_view(min_y).min(axis=(1, 3))
    t_max_y = tile_view(max_y).max(axis=(1, 3))
    t_min_x = tile_view(min_x).min(axis=(1, 3))
    t_max_x = tile_view(max_x).max(axis=(1, 3))

    lo_y = np.floor(t_min_y).astype(np.int64) - off
    hi_y = np.floor(t_max_y).astype(np.int64) - off + degree
    lo_x = np.floor(t_min_x).astype(np.int64) - off
    hi_x = np.floor(t_max_x).astype(np.int64) - off + degree

    oy = np.clip((lo_y // 8) * 8, 0, max(hp - wc.win_h, 0))
    ox = np.clip((lo_x // 128) * 128, 0, max(wp - wc.win_w, 0))
    fits = ((hi_y - oy) < wc.win_h) & ((hi_x - ox) < wc.win_w) \
        & (lo_y >= oy) & (lo_x >= ox)

    # per-vreg budgets (worst-case alignment slack included)
    span_y = (np.floor(max_y) - ((np.floor(min_y).astype(np.int64)
                                  - off) // 8) * 8 - off + degree)
    span_x = (np.floor(max_x) - ((np.floor(min_x).astype(np.int64)
                                  - off) // 128) * 128 - off + degree)
    vreg_ok = (span_y < 8 * wc.cand_r - degree) \
        & (span_x < 128 * wc.cand_c) \
        & (np.floor(drift) + degree + 2 <= wc.k_taps)
    if wc.shear_q:
        # residual of the quantized shear fit must fit the bands,
        # with a 1-row margin each side for float wobble in the two
        # floor() evaluations (classifier XLA vs kernel Mosaic)
        assert len(stats) >= 9, "sheared class needs tile_stats_fit"
        rlo = np.asarray(stats[7])
        rhi = np.asarray(stats[8])
        vreg_ok &= (rhi - rlo) <= 8 * wc.shear_q - degree - 3
    if wc.u_span:
        # union-tap evaluation: every pixel's K-tap row footprint must
        # fit the statically unrolled candidate rows
        assert len(stats) >= 10, \
            "u_span class needs tile_stats_fit_range"
        vreg_ok &= np.asarray(stats[9]) <= wc.u_span
    if wc.sep:
        # separable tensor-grid routing drops the y-deflection's
        # x-coupling; admissible while the dropped deflection stays
        # within the caller's scaling (<= 4 ulps of the table width,
        # see tile_stats_fit_range)
        assert len(stats) >= 11, \
            "sep class needs tile_stats_fit_range with dvx"
        vreg_ok &= np.asarray(stats[10]) <= 1.0
    t_vreg_ok = tile_view(vreg_ok).all(axis=(1, 3))

    fast = fits & t_vreg_ok
    origins = np.stack([oy, ox], axis=-1).reshape(-1, 2).astype(np.int32)
    return origins, fast


def row_block_origins(stats, tiles: np.ndarray, degree: int,
                      wc: WindowClass) -> np.ndarray:
    """Precompute, for each compact tile row (in_by, in_bx, _, _, oy,
    ox), the NRB window-relative per-row-block candidate origins
    (rb0, cb0) the kernel would otherwise derive with cross-lane min
    reductions (see _eval_row_block). Uses the same per-vreg statistics
    the classifier ran on - identical float32 values, so the results
    are bit-equal to the in-kernel reductions. Returns int32
    (nt, 2 * NRB) to append to the tile rows."""
    min_y, _may, min_x, _max, _d = [np.asarray(s) for s in stats[:5]]
    off = degree // 2
    # integer tap bases per vreg: floor for odd degrees, round for even
    # (matching _split); floor is monotone so the vreg min commutes
    half = 0.0 if degree % 2 else 0.5
    by = np.floor(min_y + half).astype(np.int64) - off
    bx = np.floor(min_x + half).astype(np.int64) - off

    nt = tiles.shape[0]
    out = np.empty((nt, 2 * NRB), np.int32)
    vr = tiles[:, 0:1] * NRB + np.arange(NRB)[None, :]   # (nt, NRB)
    vc = tiles[:, 1:2]                                   # (nt, 1)
    rb_rel = by[vr, vc] - tiles[:, 4:5]
    cb_rel = bx[vr, vc] - tiles[:, 5:6]
    rb0 = np.clip((rb_rel // 8) * 8, 0, wc.win_h - 8 * wc.cand_r)
    cb0 = np.clip((cb_rel // 128) * 128, 0,
                  wc.win_w - 128 * wc.cand_c)
    out[:, 0::2] = rb0
    out[:, 1::2] = cb0
    return out


def row_block_shear(stats, tiles: np.ndarray, degree: int,
                    wc: WindowClass) -> np.ndarray:
    """Per-row-block parameters for a sheared window class: the
    (rb0, cb0) candidate origins of row_block_origins interleaved with
    the fixed-point shear line (a_fix, b_fix) from tile_stats_fit.
    ``a_fix`` ships with the residual shift ``rlo - 1 - oy`` folded in
    (integer in the 1/A_FIX fixed point, so the shift is exact), which
    lands every used residual in [0, 8*shear_q). Returns int32
    (nt, 4 * NRB)."""
    rbcb = row_block_origins(stats, tiles, degree, wc)
    a_fix, b_fix, rlo = [np.asarray(s) for s in (stats[5], stats[6],
                                                 stats[7])]
    nt = tiles.shape[0]
    vr = tiles[:, 0:1] * NRB + np.arange(NRB)[None, :]   # (nt, NRB)
    vc = tiles[:, 1:2]                                   # (nt, 1)
    oy = tiles[:, 4:5].astype(np.int64)
    a_ship = (a_fix[vr, vc].astype(np.int64)
              + (rlo[vr, vc].astype(np.int64) - 1 - oy) * A_FIX)
    out = np.empty((nt, 4 * NRB), np.int32)
    out[:, 0::4] = rbcb[:, 0::2]
    out[:, 1::4] = rbcb[:, 1::2]
    out[:, 2::4] = a_ship
    out[:, 3::4] = b_fix[vr, vc]
    return out
