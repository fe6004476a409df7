"""Pallas resample kernel tests (interpreter mode on CPU - the Mosaic
lowering itself is exercised on TPU by the bench and CLI)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from envutil_tpu.ops import pallas_resample as PR
from envutil_tpu.ops import spline as S

RNG = np.random.default_rng(5)


def _setup(degree):
    img = jnp.asarray(RNG.uniform(0, 1, (300, 420, 3)), jnp.float32)
    spl = S.make_spline(img, degree, bcs=(S.MIRROR, S.MIRROR))
    H, W = 256, 256
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    sx = (60 + 0.9 * jj + 10 * np.sin(ii / 40)).astype(np.float32)
    sy = (40 + 0.8 * ii + 7 * np.sin(sx / 23)).astype(np.float32)
    ref = S.eval_spline(spl, jnp.asarray(sx), jnp.asarray(sy),
                        apply_gate=False)
    coeffp = jnp.moveaxis(spl.coeff, -1, 0)
    px = jnp.asarray(sx + spl.pad)
    py = jnp.asarray(sy + spl.pad)
    return spl, coeffp, px, py, np.asarray(ref)


@pytest.mark.parametrize("degree", [1, 3])
def test_resample_matches_eval_spline(degree):
    spl, coeffp, px, py, ref = _setup(degree)
    stats = PR.tile_stats(px, py)
    origins, fast = PR.classify_tiles(
        [np.asarray(s) for s in stats], coeffp.shape[1],
        coeffp.shape[2], degree, PR.LOCAL)
    assert fast.all()
    out = PR.resample_planar(coeffp, px, py, jnp.asarray(origins),
                             degree=degree, wc=PR.LOCAL, interpret=True)
    out = np.moveaxis(np.asarray(out), 0, -1)
    np.testing.assert_allclose(out, ref, atol=5e-5)


@pytest.mark.parametrize("degree", [1, 3])
@pytest.mark.parametrize("wc", [PR.TIGHT, PR.ROWS4, PR.ROWS6,
                                PR.ALIGNED, PR.MID],
                         ids=["tight", "r4", "r6", "aligned",
                              "mid"])
def test_resample_small_classes(degree, wc):
    # gentle warp fitting the small-budget classes
    img = jnp.asarray(RNG.uniform(0, 1, (300, 420, 3)), jnp.float32)
    spl = S.make_spline(img, degree, bcs=(S.MIRROR, S.MIRROR))
    H, W = 128, 256
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    sx = (40 + 0.9 * jj + 3 * np.sin(ii / 60)).astype(np.float32)
    sy = (30 + 0.8 * ii + 2 * np.sin(jj / 70)).astype(np.float32)
    ref = S.eval_spline(spl, jnp.asarray(sx), jnp.asarray(sy),
                        apply_gate=False)
    coeffp = jnp.moveaxis(spl.coeff, -1, 0)
    px = jnp.asarray(sx + spl.pad)
    py = jnp.asarray(sy + spl.pad)
    origins, fast = PR.classify_tiles(
        [np.asarray(s) for s in PR.tile_stats(px, py)],
        coeffp.shape[1], coeffp.shape[2], degree, wc)
    assert fast.all()
    out = PR.resample_planar(coeffp, px, py, jnp.asarray(origins),
                             degree=degree, wc=wc,
                             interpret=True)
    out = np.moveaxis(np.asarray(out), 0, -1)
    np.testing.assert_allclose(out, np.asarray(ref), atol=5e-5)


def test_inactive_tiles_skipped():
    spl, coeffp, px, py, ref = _setup(1)
    stats = PR.tile_stats(px, py)
    origins, fast = PR.classify_tiles(
        [np.asarray(s) for s in stats], coeffp.shape[1],
        coeffp.shape[2], 1, PR.LOCAL)
    org3 = np.concatenate(
        [origins, np.zeros((origins.shape[0], 1), np.int32)], axis=1)
    org3[0, 2] = 1  # only tile (0, 0) active
    out = PR.resample_planar(coeffp, px, py, jnp.asarray(org3),
                             degree=1, wc=PR.LOCAL, interpret=True)
    out = np.moveaxis(np.asarray(out), 0, -1)
    np.testing.assert_allclose(out[:128, :128], ref[:128, :128],
                               atol=5e-5)


def test_resample_twined_matches_tap_loop():
    spl, coeffp, px, py, _ref = _setup(3)
    spread = ((-0.5, -0.25, 0.3), (0.0, 0.0, 0.4), (0.5, 0.25, 0.3))
    dux = jnp.full(px.shape, 0.6, jnp.float32)
    duy = jnp.full(px.shape, 0.1, jnp.float32)
    dvx = jnp.full(px.shape, -0.1, jnp.float32)
    dvy = jnp.full(px.shape, 0.5, jnp.float32)
    cmx = max(abs(c[0]) for c in spread)
    cmy = max(abs(c[1]) for c in spread)
    mx = cmx * jnp.abs(dux) + cmy * jnp.abs(dvx)
    my = cmx * jnp.abs(duy) + cmy * jnp.abs(dvy)
    stats = PR.tile_stats_range(px - mx, px + mx, py - my, py + my)
    origins, fast = PR.classify_tiles(
        [np.asarray(s) for s in stats], coeffp.shape[1],
        coeffp.shape[2], 3, PR.LOCAL)
    assert fast.all()
    spread_flat = jnp.asarray(np.asarray(spread, np.float32).ravel())
    out = PR.resample_twined(coeffp, px, py, dux, duy, dvx, dvy,
                             jnp.asarray(origins), spread_flat,
                             degree=3, n_taps=3, cmax_x=cmx,
                             cmax_y=cmy, wc=PR.LOCAL, interpret=True)
    out = np.moveaxis(np.asarray(out), 0, -1)
    ref = None
    for cx, cy, wgt in spread:
        v = S.eval_spline(spl, px + cx * dux + cy * dvx - spl.pad,
                          py + cx * duy + cy * dvy - spl.pad,
                          apply_gate=False)
        ref = wgt * v if ref is None else ref + wgt * v
    np.testing.assert_allclose(out, np.asarray(ref), atol=5e-5)


def test_classifier_flags_wide_tiles():
    # a warp whose x spans the whole table cannot be windowed
    coeffp = jnp.zeros((1, 512, 4096), jnp.float32)
    H = W = 128
    jjj = np.arange(W) * 30.0  # 30 px per output px: exceeds budgets
    sx = jnp.asarray(np.broadcast_to(jjj[None, :], (H, W)), jnp.float32)
    sy = jnp.full((H, W), 20.0, jnp.float32)
    origins, fast = PR.classify_tiles(
        [np.asarray(s) for s in PR.tile_stats(sx, sy)],
        512, 4096, 1, PR.LOCAL)
    assert not fast.any()


def test_rolled_spline_exact():
    img = jnp.asarray(RNG.uniform(0, 1, (32, 64, 2)), jnp.float32)
    spl = S.make_spline(img, 3, bcs=(S.MIRROR, S.PERIODIC))
    rolled = S.rolled_spline(spl)
    xs = jnp.asarray(RNG.uniform(0, 64, 200), jnp.float32)
    ys = jnp.asarray(RNG.uniform(0, 31, 200), jnp.float32)
    a = S.eval_spline(spl, xs, ys)
    b = S.eval_spline(rolled, xs + 32.0, ys)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_rolled_spline_spherical():
    img = jnp.asarray(RNG.uniform(0, 1, (16, 32, 1)), jnp.float32)
    spl = S.make_spline(img, 3, spherical=True)
    rolled = S.rolled_spline(spl)
    xs = jnp.asarray(RNG.uniform(0, 32, 100), jnp.float32)
    ys = jnp.asarray(RNG.uniform(0, 15, 100), jnp.float32)
    a = S.eval_spline(spl, xs, ys)
    b = S.eval_spline(rolled, xs + 16.0, ys)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _compact_tiles(stats, nty, ntx, degree, wc, hp, wp):
    origins, fast = PR.classify_tiles(
        [np.asarray(s) for s in stats], hp, wp, degree, wc)
    assert fast.all()
    iby, ibx = np.nonzero(fast)
    org = origins[iby * ntx + ibx]
    tiles = np.column_stack([iby, ibx, iby, ibx,
                             org[:, 0], org[:, 1]]).astype(np.int32)
    ext = PR.row_block_origins(stats, tiles, degree, wc)
    assert ext.shape == (tiles.shape[0], 2 * PR.NRB)
    assert (ext[:, 0::2] % 8 == 0).all()
    assert (ext[:, 1::2] % 128 == 0).all()
    return np.concatenate([tiles, ext], axis=1)


@pytest.mark.parametrize("degree", [2, 3])
def test_resample_into_extended_rows(degree):
    """Extended tile rows (host-precomputed per-row-block origins)
    produce the same exact evaluation as the in-kernel reductions."""
    spl, coeffp, px, py, ref = _setup(degree)
    stats = [np.asarray(s) for s in PR.tile_stats(px, py)]
    nty, ntx = px.shape[0] // PR.TILE_H, px.shape[1] // PR.TILE_W
    tiles = _compact_tiles(stats, nty, ntx, degree, PR.LOCAL,
                           coeffp.shape[1], coeffp.shape[2])
    canvas = jnp.zeros((coeffp.shape[0],) + px.shape, jnp.float32)
    out = PR.resample_planar_into(canvas, coeffp, px, py,
                                  jnp.asarray(tiles), degree=degree,
                                  wc=PR.LOCAL, interpret=True)
    out = np.moveaxis(np.asarray(out), 0, -1)
    np.testing.assert_allclose(out, ref, atol=5e-5)
    # and the plain 6-int rows still work (in-kernel reductions)
    out6 = PR.resample_planar_into(canvas, coeffp, px, py,
                                   jnp.asarray(tiles[:, :6]),
                                   degree=degree, wc=PR.LOCAL,
                                   interpret=True)
    out6 = np.moveaxis(np.asarray(out6), 0, -1)
    np.testing.assert_allclose(out6, ref, atol=5e-5)


@pytest.mark.parametrize("degree", [1, 3])
def test_resample_into_interleaved(degree):
    """In-kernel interleaved emit: the (H, 3W) canvas holds exactly
    the row-major bytes of the planar result moved channel-minor -
    out[y, 3x + c] == planar[c, y, x], bit-for-bit. Pins the lane
    stretch semantics (a tile-concat 'repeat' emit once shipped
    producing wrong bytes; this test is what catches that class of
    bug)."""
    spl, coeffp, px, py, ref = _setup(degree)
    stats = [np.asarray(s) for s in PR.tile_stats(px, py)]
    nty, ntx = px.shape[0] // PR.TILE_H, px.shape[1] // PR.TILE_W
    tiles = _compact_tiles(stats, nty, ntx, degree, PR.LOCAL,
                           coeffp.shape[1], coeffp.shape[2])
    planar = PR.resample_planar_into(
        jnp.zeros((3,) + px.shape, jnp.float32), coeffp, px, py,
        jnp.asarray(tiles), degree=degree, wc=PR.LOCAL,
        interpret=True)
    ilv = PR.resample_planar_into(
        jnp.zeros((px.shape[0], 3 * px.shape[1]), jnp.float32),
        coeffp, px, py, jnp.asarray(tiles), degree=degree,
        wc=PR.LOCAL, interpret=True, interleave=True)
    want = np.moveaxis(np.asarray(planar), 0, -1).reshape(
        px.shape[0], 3 * px.shape[1])
    np.testing.assert_array_equal(np.asarray(ilv), want)


def test_resample_into_interleaved_merge_mask():
    """Masked-merge interleaved emit: mask<=0.5 pixels keep the prior
    canvas contents at their interleaved positions."""
    degree = 3
    spl, coeffp, px, py, ref = _setup(degree)
    stats = [np.asarray(s) for s in PR.tile_stats(px, py)]
    nty, ntx = px.shape[0] // PR.TILE_H, px.shape[1] // PR.TILE_W
    tiles = _compact_tiles(stats, nty, ntx, degree, PR.LOCAL,
                           coeffp.shape[1], coeffp.shape[2])
    mrng = np.random.default_rng(17)
    mask = (mrng.uniform(size=px.shape) < 0.6).astype(np.float32)
    prior_pl = jnp.asarray(
        RNG.uniform(2, 3, (3,) + px.shape), jnp.float32)
    prior_il = jnp.asarray(np.moveaxis(
        np.asarray(prior_pl), 0, -1).reshape(px.shape[0], -1))
    planar = PR.resample_planar_into(
        prior_pl, coeffp, px, py, jnp.asarray(tiles), degree=degree,
        wc=PR.LOCAL, interpret=True, merge_mask=jnp.asarray(mask))
    ilv = PR.resample_planar_into(
        prior_il, coeffp, px, py, jnp.asarray(tiles), degree=degree,
        wc=PR.LOCAL, interpret=True, merge_mask=jnp.asarray(mask),
        interleave=True)
    want = np.moveaxis(np.asarray(planar), 0, -1).reshape(
        px.shape[0], -1)
    np.testing.assert_array_equal(np.asarray(ilv), want)


@pytest.mark.parametrize("degree", [1, 3])
def test_resample_into_merge_mask(degree):
    """merge_mask overlay: the kernel writes only mask>0.5 pixels and
    keeps the canvas's prior contents elsewhere (the cubemap
    face-boundary merge path)."""
    spl, coeffp, px, py, ref = _setup(degree)
    stats = [np.asarray(s) for s in PR.tile_stats(px, py)]
    nty, ntx = px.shape[0] // PR.TILE_H, px.shape[1] // PR.TILE_W
    tiles = _compact_tiles(stats, nty, ntx, degree, PR.LOCAL,
                           coeffp.shape[1], coeffp.shape[2])
    prior = jnp.asarray(
        RNG.uniform(2, 3, (coeffp.shape[0],) + px.shape), jnp.float32)
    mrng = np.random.default_rng(11)
    mask = (mrng.uniform(size=px.shape) < 0.6).astype(np.float32)
    out = PR.resample_planar_into(prior, coeffp, px, py,
                                  jnp.asarray(tiles), degree=degree,
                                  wc=PR.LOCAL, interpret=True,
                                  merge_mask=jnp.asarray(mask))
    out = np.moveaxis(np.asarray(out), 0, -1)
    pm = np.moveaxis(np.asarray(prior), 0, -1)
    keep = mask <= 0.5
    np.testing.assert_allclose(out[keep], pm[keep], atol=0)
    np.testing.assert_allclose(out[~keep], ref[~keep], atol=5e-5)


def test_resample_twined_into_merge_mask():
    spl, coeffp, px, py, _ref = _setup(3)
    spread = ((-0.5, -0.25, 0.3), (0.0, 0.0, 0.4), (0.5, 0.25, 0.3))
    dux = jnp.full(px.shape, 0.6, jnp.float32)
    duy = jnp.full(px.shape, 0.1, jnp.float32)
    dvx = jnp.full(px.shape, -0.1, jnp.float32)
    dvy = jnp.full(px.shape, 0.5, jnp.float32)
    cmx = max(abs(c[0]) for c in spread)
    cmy = max(abs(c[1]) for c in spread)
    mx = cmx * jnp.abs(dux) + cmy * jnp.abs(dvx)
    my = cmx * jnp.abs(duy) + cmy * jnp.abs(dvy)
    stats = PR.tile_stats_range(px - mx, px + mx, py - my, py + my)
    nty, ntx = px.shape[0] // PR.TILE_H, px.shape[1] // PR.TILE_W
    tiles = _compact_tiles([np.asarray(s) for s in stats], nty, ntx,
                           3, PR.LOCAL, coeffp.shape[1],
                           coeffp.shape[2])
    spread_flat = jnp.asarray(np.asarray(spread, np.float32).ravel())
    prior = jnp.asarray(
        RNG.uniform(2, 3, (coeffp.shape[0],) + px.shape), jnp.float32)
    mrng = np.random.default_rng(13)
    mask = (mrng.uniform(size=px.shape) < 0.6).astype(np.float32)
    out = PR.resample_twined_into(prior, coeffp, px, py, dux, duy,
                                  dvx, dvy, jnp.asarray(tiles),
                                  spread_flat, degree=3, n_taps=3,
                                  wc=PR.LOCAL, interpret=True,
                                  merge_mask=jnp.asarray(mask))
    out = np.moveaxis(np.asarray(out), 0, -1)
    ref = None
    for cx, cy, wgt in spread:
        v = S.eval_spline(spl, px + cx * dux + cy * dvx - spl.pad,
                          py + cx * duy + cy * dvy - spl.pad,
                          apply_gate=False)
        ref = wgt * v if ref is None else ref + wgt * v
    pm = np.moveaxis(np.asarray(prior), 0, -1)
    keep = mask <= 0.5
    np.testing.assert_allclose(out[keep], pm[keep], atol=0)
    np.testing.assert_allclose(out[~keep], np.asarray(ref)[~keep],
                               atol=5e-5)


@pytest.mark.parametrize("sheared", [False, True],
                         ids=["plain", "sheared"])
@pytest.mark.parametrize("n_taps,defl,u_span",
                         [(4, 0.5, 2), (16, 1.5, 6)],
                         ids=["4tap", "16tap"])
def test_resample_twined_union_taps(sheared, n_taps, defl, u_span):
    """Union-tap twined evaluation (u_span classes): gathers shared
    across taps, per-tap VPU routing - must match the XLA tap loop
    exactly for both the plain and the sheared window paths."""
    import dataclasses
    import itertools

    img = jnp.asarray(RNG.uniform(0, 1, (300, 420, 3)), jnp.float32)
    spl = S.make_spline(img, 3, bcs=(S.MIRROR, S.MIRROR))
    H, W = 256, 256
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    sx = (60 + 0.9 * jj + 3 * np.sin(ii / 40)).astype(np.float32)
    sy = (40 + 0.7 * ii + 0.15 * jj
          + 2 * np.sin(jj / 50)).astype(np.float32)
    coeffp = jnp.moveaxis(spl.coeff, -1, 0)
    px = jnp.asarray(sx + spl.pad)
    py = jnp.asarray(sy + spl.pad)
    side = int(round(math.sqrt(n_taps)))
    g = np.linspace(-defl, defl, side)
    spread = tuple((float(cx), float(cy), 1.0 / n_taps)
                   for cy, cx in itertools.product(g, g))
    dux = jnp.full(px.shape, 0.9, jnp.float32)
    duy = jnp.full(px.shape, 0.2, jnp.float32)
    dvx = jnp.full(px.shape, -0.2, jnp.float32)
    dvy = jnp.full(px.shape, 0.8, jnp.float32)
    cmx = max(abs(c[0]) for c in spread)
    cmy = max(abs(c[1]) for c in spread)
    mx = cmx * jnp.abs(dux) + cmy * jnp.abs(dvx)
    my = cmx * jnp.abs(duy) + cmy * jnp.abs(dvy)
    stats = [np.asarray(s) for s in
             PR.tile_stats_fit_range(px, py, mx, my, 3)]
    assert stats[9].max() <= u_span  # the budget the kernel relies on
    nty, ntx = H // PR.TILE_H, W // PR.TILE_W
    if sheared:
        wc = dataclasses.replace(PR.SHEAR_LOCAL_3, u_span=u_span)
        tiles = _shear_tiles(stats, nty, ntx, 3, wc,
                             coeffp.shape[1], coeffp.shape[2])
    else:
        wc = dataclasses.replace(PR.LOCAL, u_span=u_span)
        tiles = _compact_tiles(stats, nty, ntx, 3, wc,
                               coeffp.shape[1], coeffp.shape[2])
    spread_flat = jnp.asarray(np.asarray(spread, np.float32).ravel())
    canvas = jnp.zeros((coeffp.shape[0],) + px.shape, jnp.float32)
    out = PR.resample_twined_into(canvas, coeffp, px, py, dux, duy,
                                  dvx, dvy, jnp.asarray(tiles),
                                  spread_flat, degree=3,
                                  n_taps=n_taps, wc=wc, interpret=True)
    out = np.moveaxis(np.asarray(out), 0, -1)
    ref = None
    for cx, cy, wgt in spread:
        v = S.eval_spline(spl, px + cx * dux + cy * dvx - spl.pad,
                          py + cx * duy + cy * dvy - spl.pad,
                          apply_gate=False)
        ref = wgt * v if ref is None else ref + wgt * v
    np.testing.assert_allclose(out, np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("sheared", [False, True],
                         ids=["plain", "sheared"])
def test_resample_twined_sep_grid(sheared):
    """Separable tensor-grid routing (WindowClass.sep): on dvx == 0
    tiles with a full kx x ky tap grid, the horizontal routing runs
    per grid column and the weight update is one outer product per
    column - must match the XLA tap loop exactly (same taps, same
    weights; only the accumulation grouping differs)."""
    import dataclasses
    import itertools

    img = jnp.asarray(RNG.uniform(0, 1, (900, 900, 3)), jnp.float32)
    spl = S.make_spline(img, 1, bcs=(S.MIRROR, S.MIRROR))
    H, W = 256, 256
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    # ~2.8x horizontal minification with a mild shear - the
    # 16K-downscale shape. The vertical scale is kept at unit for the
    # sheared case (the q3 band budget caps the per-vreg sublane
    # advance + the twined residual slack at 8q - degree - 3 rows).
    vs = 1.0 if sheared else 2.6
    sx = (60 + 2.8 * jj + 3 * np.sin(ii / 40)).astype(np.float32)
    sy = (40 + vs * ii + 0.15 * jj
          + 2 * np.sin(jj / 50)).astype(np.float32)
    coeffp = jnp.moveaxis(spl.coeff, -1, 0)
    px = jnp.asarray(sx + spl.pad)
    py = jnp.asarray(sy + spl.pad)
    # derivatives at the production DERIV_BIAS quarter-pixel step,
    # spread cx/cy bias-folded (x4) like fastpath does - the drift/k
    # budgets are sized for exactly this scaling
    g = np.linspace(-1.5, 1.5, 4)
    spread = tuple((float(cx), float(cy), 1.0 / 16)
                   for cy, cx in itertools.product(g, g))
    dux = jnp.full(px.shape, 0.25 * 2.8, jnp.float32)
    duy = jnp.full(px.shape, 0.25 * 0.15, jnp.float32)
    dvx = jnp.zeros(px.shape, jnp.float32)   # the sep admission bit
    dvy = jnp.full(px.shape, 0.25 * vs, jnp.float32)
    cmx = max(abs(c[0]) for c in spread)
    cmy = max(abs(c[1]) for c in spread)
    mx = cmx * jnp.abs(dux) + cmy * jnp.abs(dvx)
    my = cmx * jnp.abs(duy) + cmy * jnp.abs(dvy)
    stats = [np.asarray(s) for s in
             PR.tile_stats_fit_range(px, py, mx, my, 1, dvx=dvx)]
    assert len(stats) == 11 and (stats[10] <= 1.0).all()
    u_span = int(stats[9].max())
    nty, ntx = H // PR.TILE_H, W // PR.TILE_W
    if sheared:
        wc = dataclasses.replace(PR.SHEAR_MINIFY_3, u_span=u_span,
                                 sep=True, k_taps=6)
        tiles = _shear_tiles(stats, nty, ntx, 1, wc,
                             coeffp.shape[1], coeffp.shape[2])
    else:
        wc = dataclasses.replace(PR.MINIFY, u_span=u_span, sep=True,
                                 k_taps=6)
        tiles = _compact_tiles(stats, nty, ntx, 1, wc,
                               coeffp.shape[1], coeffp.shape[2])
    cxs = tuple(sorted({t[0] for t in spread}))
    cys = tuple(sorted({t[1] for t in spread}))
    wgrid = {(cx, cy): w for cx, cy, w in spread}
    flat = list(cxs) + list(cys) + [wgrid[(cx, cy)]
                                    for cy in cys for cx in cxs]
    spread_sep = jnp.asarray(np.asarray(flat, np.float32))
    canvas = jnp.zeros((coeffp.shape[0],) + px.shape, jnp.float32)
    out = PR.resample_twined_into(canvas, coeffp, px, py, dux, duy,
                                  dvx, dvy, jnp.asarray(tiles),
                                  spread_sep, degree=1, n_taps=16,
                                  wc=wc, interpret=True,
                                  grid=(4, 4))
    out = np.moveaxis(np.asarray(out), 0, -1)
    ref = None
    for cx, cy, wgt in spread:
        v = S.eval_spline(spl, px + cx * dux + cy * dvx - spl.pad,
                          py + cx * duy + cy * dvy - spl.pad,
                          apply_gate=False)
        ref = wgt * v if ref is None else ref + wgt * v
    np.testing.assert_allclose(out, np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("sheared", [False, True],
                         ids=["plain", "sheared"])
@pytest.mark.parametrize("union", [True, False],
                         ids=["union", "pertap"])
def test_resample_twined_tapsel(sheared, union):
    """Champion-routed per-pixel tap weights (tapsel): a
    (n_taps, H, W) champion-id stack rides into the kernel and tap ti
    contributes only where champ[ti] == fi. Running the kernel once
    per 'facet' id and summing must reproduce the per-pixel
    champion-select of the per-tap reference loop - the voronoi seam
    combine regrouped facet-major (fastpath._pertap_build)."""
    import dataclasses
    import itertools

    img = jnp.asarray(RNG.uniform(0, 1, (300, 420, 3)), jnp.float32)
    spl = S.make_spline(img, 3, bcs=(S.MIRROR, S.MIRROR))
    H, W = 256, 256
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    sx = (60 + 0.9 * jj + 3 * np.sin(ii / 40)).astype(np.float32)
    sy = (40 + 0.7 * ii + 0.15 * jj
          + 2 * np.sin(jj / 50)).astype(np.float32)
    coeffp = jnp.moveaxis(spl.coeff, -1, 0)
    px = jnp.asarray(sx + spl.pad)
    py = jnp.asarray(sy + spl.pad)
    n_taps = 4
    g = np.linspace(-0.5, 0.5, 2)
    spread = tuple((float(cx), float(cy), 1.0 / n_taps)
                   for cy, cx in itertools.product(g, g))
    dux = jnp.full(px.shape, 0.9, jnp.float32)
    duy = jnp.full(px.shape, 0.2, jnp.float32)
    dvx = jnp.full(px.shape, -0.2, jnp.float32)
    dvy = jnp.full(px.shape, 0.8, jnp.float32)
    cmx = max(abs(c[0]) for c in spread)
    cmy = max(abs(c[1]) for c in spread)
    mx = cmx * jnp.abs(dux) + cmy * jnp.abs(dvx)
    my = cmx * jnp.abs(duy) + cmy * jnp.abs(dvy)
    stats = [np.asarray(s) for s in
             PR.tile_stats_fit_range(px, py, mx, my, 3)]
    u_span = int(stats[9].max()) if union else 0
    if sheared:
        wc = dataclasses.replace(PR.SHEAR_LOCAL_3, u_span=u_span)
        tiles = _shear_tiles(stats, 2, 2, 3, wc, coeffp.shape[1],
                             coeffp.shape[2])
    else:
        wc = dataclasses.replace(PR.LOCAL, u_span=u_span)
        tiles = _compact_tiles(stats, 2, 2, 3, wc, coeffp.shape[1],
                               coeffp.shape[2])
    # a seam-like champion field: facet 0 wins left of a wavy
    # diagonal (shifted per tap, like deflected rays move the seam),
    # facet 1 right of it, nobody in a far corner (champ == -1)
    ch = np.zeros((n_taps, H, W), np.int32)
    for k in range(n_taps):
        seam = 100 + 0.4 * ii + 10 * np.sin(jj / 30) + 7 * k
        ch[k] = np.where(jj < seam, 0, 1)
        ch[k][(ii > 200 + 5 * k) & (jj > 220)] = -1
    champ = jnp.asarray(ch)
    # facet id rides appended to the flat spread
    outs = []
    for fi in (0, 1):
        spread_fi = jnp.asarray(np.concatenate(
            [np.asarray(spread, np.float32).ravel(),
             np.asarray([fi], np.float32)]))
        canvas = jnp.zeros((coeffp.shape[0],) + px.shape, jnp.float32)
        out = PR.resample_twined_into(
            canvas, coeffp, px, py, dux, duy, dvx, dvy,
            jnp.asarray(tiles), spread_fi, degree=3, n_taps=n_taps,
            wc=wc, interpret=True, champ=champ)
        outs.append(np.moveaxis(np.asarray(out), 0, -1))
    ref = [np.zeros((H, W, 3), np.float32) for _fi in (0, 1)]
    for k, (cx, cy, wgt) in enumerate(spread):
        v = np.asarray(S.eval_spline(
            spl, px + cx * dux + cy * dvx - spl.pad,
            py + cx * duy + cy * dvy - spl.pad, apply_gate=False))
        for fi in (0, 1):
            sel = (ch[k] == fi)[..., None]
            ref[fi] = ref[fi] + np.where(sel, wgt * v, 0.0)
    for fi in (0, 1):
        np.testing.assert_allclose(outs[fi], ref[fi], atol=5e-5)


@pytest.mark.parametrize("wc_name", ["shear_minify_3", "shear_steep"],
                         ids=["minify3", "steep"])
def test_resample_minify_shear_classes(wc_name):
    """Dedicated coverage for the deeper-band shear classes
    (SHEAR_MINIFY_3 / SHEAR_STEEP - the 16K twining ladder's
    workhorses, VERDICT r3 item 4b): a strongly minified warp with a
    linear shear must classify under the class and evaluate exactly
    via the sheared-band kernel."""
    img = jnp.asarray(RNG.uniform(0, 1, (1400, 1200, 3)), jnp.float32)
    spl = S.make_spline(img, 3, bcs=(S.MIRROR, S.MIRROR))
    H, W = 128, 256
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    # the q-band residual budget (8q - degree - 3 rows) caps the
    # per-vreg sublane advance: ~<=1.8 rows/output-row for q3,
    # ~<=2.7 for q4 (the bx-fit only captures the column slope)
    if wc_name == "shear_minify_3":
        wc = PR.SHEAR_MINIFY_3
        sx = (70 + 3.0 * jj + 1.5 * np.sin(ii / 50)).astype(np.float32)
        sy = (50 + 1.8 * ii + 0.25 * jj
              + 1.0 * np.sin(jj / 60)).astype(np.float32)
    else:
        wc = PR.SHEAR_STEEP
        # deeper vreg row span plus a steep column-direction row slope
        # (facet-corner territory)
        sx = (90 + 2.2 * jj + 1.0 * np.sin(ii / 60)).astype(np.float32)
        sy = (80 + 2.7 * ii + 0.9 * jj
              + 1.5 * np.sin(jj / 70)).astype(np.float32)
    coeffp = jnp.moveaxis(spl.coeff, -1, 0)
    px = jnp.asarray(sx + spl.pad)
    py = jnp.asarray(sy + spl.pad)
    ref = S.eval_spline(spl, jnp.asarray(sx), jnp.asarray(sy),
                        apply_gate=False)
    stats = [np.asarray(s) for s in PR.tile_stats_fit(px, py, 3)]
    nty, ntx = H // PR.TILE_H, W // PR.TILE_W
    tiles = _shear_tiles(stats, nty, ntx, 3, wc,
                         coeffp.shape[1], coeffp.shape[2])
    canvas = jnp.zeros((coeffp.shape[0],) + px.shape, jnp.float32)
    out = PR.resample_planar_into(canvas, coeffp, px, py,
                                  jnp.asarray(tiles), degree=3,
                                  wc=wc, interpret=True)
    out = np.moveaxis(np.asarray(out), 0, -1)
    np.testing.assert_allclose(out, np.asarray(ref), atol=5e-5)


def test_masked_coord_fill_budgets():
    """The fill never widens a vreg's span (clamped to the valid
    range) and valid pixels pass through untouched."""
    h, w = 128, 256
    rng = np.random.default_rng(3)
    a = (100 + 0.7 * np.tile(np.arange(w), (h, 1))
         + rng.normal(0, 0.3, (h, w))).astype(np.float32)
    mask = rng.uniform(size=(h, w)) < 0.3
    mask[:, 64:] = False  # lanes with no valid pixels force the fit
    filled = np.asarray(PR.masked_coord_fill(jnp.asarray(a),
                                             jnp.asarray(mask)))
    np.testing.assert_array_equal(filled[mask], a[mask])
    va = a.reshape(h // 8, 8, w // 128, 128)
    vf = filled.reshape(h // 8, 8, w // 128, 128)
    vm = mask.reshape(h // 8, 8, w // 128, 128)
    for i in range(va.shape[0]):
        for j in range(va.shape[2]):
            if vm[i, :, j, :].any():
                lo = va[i, :, j, :][vm[i, :, j, :]].min()
                hi = va[i, :, j, :][vm[i, :, j, :]].max()
                assert vf[i, :, j, :].min() >= lo - 1e-4
                assert vf[i, :, j, :].max() <= hi + 1e-4


def test_resample_twined_into_extended_rows():
    spl, coeffp, px, py, _ref = _setup(3)
    spread = ((-0.5, -0.25, 0.3), (0.0, 0.0, 0.4), (0.5, 0.25, 0.3))
    dux = jnp.full(px.shape, 0.6, jnp.float32)
    duy = jnp.full(px.shape, 0.1, jnp.float32)
    dvx = jnp.full(px.shape, -0.1, jnp.float32)
    dvy = jnp.full(px.shape, 0.5, jnp.float32)
    cmx = max(abs(c[0]) for c in spread)
    cmy = max(abs(c[1]) for c in spread)
    mx = cmx * jnp.abs(dux) + cmy * jnp.abs(dvx)
    my = cmx * jnp.abs(duy) + cmy * jnp.abs(dvy)
    stats = PR.tile_stats_range(px - mx, px + mx, py - my, py + my)
    nty, ntx = px.shape[0] // PR.TILE_H, px.shape[1] // PR.TILE_W
    tiles = _compact_tiles([np.asarray(s) for s in stats], nty, ntx,
                           3, PR.LOCAL, coeffp.shape[1],
                           coeffp.shape[2])
    spread_flat = jnp.asarray(np.asarray(spread, np.float32).ravel())
    canvas = jnp.zeros((coeffp.shape[0],) + px.shape, jnp.float32)
    out = PR.resample_twined_into(canvas, coeffp, px, py, dux, duy,
                                  dvx, dvy, jnp.asarray(tiles),
                                  spread_flat, degree=3, n_taps=3,
                                  wc=PR.LOCAL, interpret=True)
    out = np.moveaxis(np.asarray(out), 0, -1)
    ref = None
    for cx, cy, wgt in spread:
        v = S.eval_spline(spl, px + cx * dux + cy * dvx - spl.pad,
                          py + cx * duy + cy * dvy - spl.pad,
                          apply_gate=False)
        ref = wgt * v if ref is None else ref + wgt * v
    np.testing.assert_allclose(out, np.asarray(ref), atol=5e-5)


def test_tap_mask_score_traced_bias():
    """The traced-bias per-tap mask/score pass equals the static-bias
    coordinate pass (per-tap synopsis semantics, fastpath)."""
    import math

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.models import stepper as ST
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.fastpath import (_coords, _tap_mask_score,
                                              _basis_arg)
    from envutil_tpu.runtime.render import build_plan

    img = np.asarray(RNG.uniform(0, 1, (64, 96, 3)), np.float32)
    fct = Facet(facet_no=0, nchannels=3)
    fct.set_geometry(Projection.RECTILINEAR, 96, 64, math.radians(70))
    fct.step = get_step(Projection.RECTILINEAR, 96, 64,
                        math.radians(70))
    fct.yaw = math.radians(25.0)
    fct.process_geometry()
    src = E.make_mount_source(fct, img, 1, 1)

    args = Args()
    args.projection = Projection.RECTILINEAR
    args.width = args.height = 128
    args.hfov = math.radians(90)
    args.extent = get_extent(args.projection, 128, 128, args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / 128
    args.spline_degree = args.prefilter_degree = 1
    args.nchannels = 3
    args.facets = [fct]
    plan = build_plan(args, [fct])
    window = (0, 128, 0, 128)
    basis = _basis_arg(plan, 0)

    for tap in ((0.0, 0.0), (0.25, 0.0), (-0.17, 0.31)):
        ref = _coords(plan, window, "orig", src, 0, tap, basis)
        m, s = _tap_mask_score(plan, window, src, 0,
                               jnp.asarray(tap, jnp.float32), basis)
        np.testing.assert_array_equal(np.asarray(m), np.asarray(ref[2]))
        # score = ray_z * recip_step where valid
        exp = np.where(np.asarray(ref[2]),
                       np.asarray(ref[3]) * src.static.recip_step,
                       np.float32(np.finfo(np.float32).min))
        np.testing.assert_allclose(np.asarray(s)[np.asarray(m)],
                                   exp[np.asarray(m)], rtol=2e-5)


def test_resample_into_bf16_coefficients():
    """bfloat16 coefficient storage: the kernel upcasts the window
    once per tile; result matches the f32 evaluation to bf16 rounding
    (~2^-9 relative)."""
    degree = 3
    spl, coeffp, px, py, ref = _setup(degree)
    stats = [np.asarray(s) for s in PR.tile_stats(px, py)]
    nty, ntx = px.shape[0] // PR.TILE_H, px.shape[1] // PR.TILE_W
    tiles = _compact_tiles(stats, nty, ntx, degree, PR.LOCAL,
                           coeffp.shape[1], coeffp.shape[2])
    canvas = jnp.zeros((coeffp.shape[0],) + px.shape, jnp.float32)
    out = PR.resample_planar_into(canvas, coeffp.astype(jnp.bfloat16),
                                  px, py, jnp.asarray(tiles),
                                  degree=degree, wc=PR.LOCAL,
                                  interpret=True)
    out = np.moveaxis(np.asarray(out), 0, -1)
    np.testing.assert_allclose(out, ref, atol=6e-3)


def _shear_tiles(stats, nty, ntx, degree, wc, hp, wp):
    origins, fast = PR.classify_tiles(stats, hp, wp, degree, wc)
    assert fast.all(), "test warp must fit the sheared class"
    iby, ibx = np.nonzero(fast)
    org = origins[iby * ntx + ibx]
    tiles = np.column_stack([iby, ibx, iby, ibx,
                             org[:, 0], org[:, 1]]).astype(np.int32)
    ext = PR.row_block_shear(stats, tiles, degree, wc)
    assert ext.shape == (tiles.shape[0], 4 * PR.NRB)
    return np.concatenate([tiles, ext], axis=1)


@pytest.mark.parametrize("degree", [1, 2, 3])
@pytest.mark.parametrize("slope", [0.05, 0.3, -0.6],
                         ids=["gentle", "steep", "neg"])
def test_resample_sheared_exact(degree, slope):
    """The sheared-window kernel is exact on warps up to strong
    diagonals: every tap still reads its exact coefficient address;
    the shear only re-bases the row resolve."""
    img = jnp.asarray(RNG.uniform(0, 1, (300, 420, 3)), jnp.float32)
    spl = S.make_spline(img, degree, bcs=(S.MIRROR, S.MIRROR))
    H, W = 128, 256
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    sx = (80 + 0.9 * jj + 3 * np.sin(ii / 60)).astype(np.float32)
    sy = ((170 if slope < 0 else 90) + 0.8 * ii + slope * jj
          + 1.5 * np.sin(jj / 90)).astype(np.float32)
    ref = S.eval_spline(spl, jnp.asarray(sx), jnp.asarray(sy),
                        apply_gate=False)
    coeffp = jnp.moveaxis(spl.coeff, -1, 0)
    px = jnp.asarray(sx + spl.pad)
    py = jnp.asarray(sy + spl.pad)
    if slope < 0:
        wc = PR.SHEAR_DIAG          # 77-row lane span needs r17
    elif slope > 0.1:
        wc = PR.SHEAR_LOCAL_3
    else:
        wc = PR.SHEAR4
    stats = [np.asarray(s)
             for s in PR.tile_stats_fit(px, py, degree)]
    nty, ntx = H // PR.TILE_H, W // PR.TILE_W
    tiles = _shear_tiles(stats, nty, ntx, degree, wc,
                         coeffp.shape[1], coeffp.shape[2])
    canvas = jnp.zeros((coeffp.shape[0], H, W), jnp.float32)
    out = PR.resample_planar_into(canvas, coeffp, px, py,
                                  jnp.asarray(tiles), degree=degree,
                                  wc=wc, interpret=True)
    out = np.moveaxis(np.asarray(out), 0, -1)
    np.testing.assert_allclose(out, np.asarray(ref), atol=5e-5)


def test_shear_classifier_rejects_curvature():
    """Tiles whose warp curves more than the band budget must be
    rejected by the sheared class (they fall to unsheared siblings)."""
    H, W = 128, 128
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    px = jnp.asarray((100 + 0.9 * jj).astype(np.float32))
    # high-frequency wiggle a linear fit cannot capture: residual
    # busts the Q=2 band budget while the raw span fits cand_r=4
    py = jnp.asarray((200 + 0.8 * ii
                      + 8 * np.sin(jj / 3.0)).astype(np.float32))
    stats = [np.asarray(s) for s in PR.tile_stats_fit(px, py, 3)]
    _o, fast = PR.classify_tiles(stats, 2048, 2048, 3, PR.SHEAR4)
    assert not fast.any()
    # the same tiles classify fine for an unsheared class
    _o2, fast2 = PR.classify_tiles(stats, 2048, 2048, 3, PR.ROWS6)
    assert fast2.all()


def test_resample_twined_sheared():
    """The twined kernel with a sheared class: one band build serves
    all taps; every deflected tap matches the XLA tap loop."""
    img = jnp.asarray(RNG.uniform(0, 1, (300, 420, 3)), jnp.float32)
    spl = S.make_spline(img, 3, bcs=(S.MIRROR, S.MIRROR))
    H, W = 256, 256
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    sx = (60 + 0.9 * jj + 3 * np.sin(ii / 40)).astype(np.float32)
    sy = (40 + 0.7 * ii + 0.15 * jj
          + 2 * np.sin(jj / 50)).astype(np.float32)
    coeffp = jnp.moveaxis(spl.coeff, -1, 0)
    px = jnp.asarray(sx + spl.pad)
    py = jnp.asarray(sy + spl.pad)
    spread = ((-0.5, -0.25, 0.3), (0.0, 0.0, 0.4), (0.5, 0.25, 0.3))
    dux = jnp.full(px.shape, 0.6, jnp.float32)
    duy = jnp.full(px.shape, 0.1, jnp.float32)
    dvx = jnp.full(px.shape, -0.1, jnp.float32)
    dvy = jnp.full(px.shape, 0.5, jnp.float32)
    cmx = max(abs(c[0]) for c in spread)
    cmy = max(abs(c[1]) for c in spread)
    mx = cmx * jnp.abs(dux) + cmy * jnp.abs(dvx)
    my = cmx * jnp.abs(duy) + cmy * jnp.abs(dvy)
    stats = [np.asarray(s) for s in
             PR.tile_stats_fit_range(px, py, mx, my, 3)]
    nty, ntx = px.shape[0] // PR.TILE_H, px.shape[1] // PR.TILE_W
    wc = PR.SHEAR_LOCAL_3
    tiles = _shear_tiles(stats, nty, ntx, 3, wc,
                         coeffp.shape[1], coeffp.shape[2])
    spread_flat = jnp.asarray(np.asarray(spread, np.float32).ravel())
    canvas = jnp.zeros((coeffp.shape[0],) + px.shape, jnp.float32)
    out = PR.resample_twined_into(canvas, coeffp, px, py, dux, duy,
                                  dvx, dvy, jnp.asarray(tiles),
                                  spread_flat, degree=3, n_taps=3,
                                  wc=wc, interpret=True)
    out = np.moveaxis(np.asarray(out), 0, -1)
    ref = None
    for cx, cy, wgt in spread:
        v = S.eval_spline(spl, px + cx * dux + cy * dvx - spl.pad,
                          py + cx * duy + cy * dvy - spl.pad,
                          apply_gate=False)
        ref = wgt * v if ref is None else ref + wgt * v
    np.testing.assert_allclose(out, np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("degree", [5, 7])
def test_resample_high_degree(degree):
    """Degrees above 3 ride the degree-shifted classes (k_taps grows
    with the degree) and stay exact."""
    img = jnp.asarray(RNG.uniform(0, 1, (300, 420, 3)), jnp.float32)
    spl = S.make_spline(img, degree, bcs=(S.MIRROR, S.MIRROR))
    H, W = 128, 256
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    sx = (80 + 0.9 * jj + 2 * np.sin(ii / 60)).astype(np.float32)
    sy = (90 + 0.8 * ii + 1.5 * np.sin(jj / 90)).astype(np.float32)
    ref = S.eval_spline(spl, jnp.asarray(sx), jnp.asarray(sy),
                        apply_gate=False)
    coeffp = jnp.moveaxis(spl.coeff, -1, 0)
    px = jnp.asarray(sx + spl.pad)
    py = jnp.asarray(sy + spl.pad)
    import dataclasses
    # the degree-shifted ROWS4 sibling the planner would pick
    wc = dataclasses.replace(PR.ROWS4,
                             k_taps=PR.ROWS4.k_taps + degree - 3)
    stats = [np.asarray(s) for s in PR.tile_stats_fit(px, py, degree)]
    origins, fast = PR.classify_tiles(stats, coeffp.shape[1],
                                      coeffp.shape[2], degree, wc)
    assert fast.all()
    nty, ntx = H // PR.TILE_H, W // PR.TILE_W
    iby, ibx = np.nonzero(fast)
    org = origins[iby * ntx + ibx]
    tiles = np.column_stack([iby, ibx, iby, ibx,
                             org[:, 0], org[:, 1]]).astype(np.int32)
    ext = PR.row_block_origins(stats, tiles, degree, wc)
    tiles = np.concatenate([tiles, ext], axis=1)
    canvas = jnp.zeros((coeffp.shape[0], H, W), jnp.float32)
    out = PR.resample_planar_into(canvas, coeffp, px, py,
                                  jnp.asarray(tiles), degree=degree,
                                  wc=wc, interpret=True)
    out = np.moveaxis(np.asarray(out), 0, -1)
    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-4)


def test_resample_inline_coords_kernel():
    """Inline-coordinates kernel (coords chain fused in-kernel) matches
    the XLA _coords + eval_spline path across target modes."""
    import math

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.runtime import fastpath
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.render import build_plan

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (256, 512, 3)).astype(np.float32)
    fct = Facet(facet_no=0, nchannels=3)
    fct.set_geometry(Projection.SPHERICAL, 512, 256, 2 * math.pi)
    fct.step = get_step(Projection.SPHERICAL, 512, 256, 2 * math.pi)
    fct.yaw = math.radians(25)
    fct.process_geometry()
    src = E.make_mount_source(fct, img, 3, 3)
    src.variants["rolled"] = S.rolled_spline(src.spl)

    for tproj, w, h, hfov in (
            (Projection.RECTILINEAR, 256, 256, 80),
            (Projection.CUBEMAP, 128, 768, 90),
            (Projection.SPHERICAL, 256, 128, 360)):
        args = Args()
        args.projection = tproj
        args.width, args.height = w, h
        args.hfov = math.radians(hfov)
        args.extent = get_extent(tproj, w, h, args.hfov)
        args.step = (args.extent.x1 - args.extent.x0) / w
        args.spline_degree = args.prefilter_degree = 3
        args.twine = 0
        args.synopsis = "panorama"
        args.nchannels = 3
        args.facets = [fct]
        args.solo = 0
        plan = build_plan(args, [fct])
        window = (0, ((h + 127) // 128) * 128,
                  0, ((w + 127) // 128) * 128)
        geom = fastpath._geom_static(plan)
        basis = fastpath._basis_arg(plan, 0)
        passes, assigned = fastpath.plan_passes(
            plan, src, window, fastpath.DEFAULT_CLASSES)
        tested = 0
        for name, wc, box, tiles, merge in passes:
            if not fastpath._inline_eligible(plan, src, 0, name,
                                             None, merge):
                continue
            spl = fastpath._variant_spline(src, name)
            stt = src.static
            statics = (stt.total_extent.x0, stt.total_extent.x1,
                       stt.total_extent.y0, stt.total_extent.y1,
                       stt.total_width, stt.total_height,
                       stt.window_x_offset, stt.window_y_offset)
            tmode, xfeat, yfeat, P, consts = fastpath._inline_setup(
                geom, window, name, spl.core_shape, spl.pad,
                tuple(spl.bcs), statics)
            if tproj in (Projection.CUBEMAP, Projection.BIATAN6):
                r0 = window[0] + tiles[:, 2] * PR.TILE_H
                faces = np.clip(r0 // plan.width, 0,
                                5).astype(np.int32)
            else:
                faces = np.zeros(tiles.shape[0], np.int32)
            bas = np.asarray(basis, np.float32)
            if name.startswith("pitched"):
                bas = np.asarray(fastpath.PITCH_BASIS.T,
                                 np.float32) @ bas
            bm = np.einsum("ij,fjk->fik", bas, P).reshape(-1, 9)
            coeffp = jnp.moveaxis(spl.coeff, -1, 0)
            ph = window[1] - window[0]
            pw = window[3] - window[2]
            canvas = jnp.zeros((coeffp.shape[0], ph, pw), jnp.float32)
            out = PR.resample_inline_into(
                canvas, coeffp, jnp.asarray(tiles),
                jnp.asarray(faces), jnp.asarray(xfeat),
                jnp.asarray(yfeat), jnp.asarray(bm),
                jnp.float32(0), degree=spl.degree, tmode=tmode,
                consts=consts, wc=wc, interpret=True)
            out = np.moveaxis(np.asarray(out), 0, -1)
            rsx, rsy, _m, _z = fastpath._coords(
                geom, window, name, src, 0, (0.0, 0.0), basis)
            ref = np.asarray(S.eval_spline(
                S.Spline2D(coeff=spl.coeff, pad=0, degree=spl.degree,
                           bcs=(S.CONSTANT, S.CONSTANT),
                           core_shape=spl.coeff.shape[:2]),
                rsx, rsy, apply_gate=False))
            for row in np.asarray(tiles):
                osl = np.s_[row[2]*PR.TILE_H:(row[2]+1)*PR.TILE_H,
                            row[3]*PR.TILE_W:(row[3]+1)*PR.TILE_W]
                np.testing.assert_allclose(out[osl], ref[osl],
                                           atol=3e-3)
            tested += 1
        assert tested, f"no inline-eligible pass for {tproj}"


def test_resample_inline_twined_kernel():
    """Inline-coordinates twined kernel matches the XLA coordinate
    passes + tap-loop reference."""
    import math

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import environment as E
    from envutil_tpu.models import stepper as ST
    from envutil_tpu.runtime import fastpath
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.render import build_plan

    rng = np.random.default_rng(9)
    img = rng.uniform(0, 1, (512, 1024, 3)).astype(np.float32)
    fct = Facet(facet_no=0, nchannels=3)
    fct.set_geometry(Projection.SPHERICAL, 1024, 512, 2 * math.pi)
    fct.step = get_step(Projection.SPHERICAL, 1024, 512, 2 * math.pi)
    fct.yaw = math.radians(15)
    fct.process_geometry()
    src = E.make_mount_source(fct, img, 1, 1)

    args = Args()
    args.projection = Projection.RECTILINEAR
    args.width, args.height = 256, 128
    args.hfov = math.radians(100)
    args.extent = get_extent(args.projection, 256, 128, args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / 256
    args.spline_degree = args.prefilter_degree = 1
    args.twine = 1
    args.twine_spread = [(-0.25, -0.25, 0.25), (0.25, -0.25, 0.25),
                         (-0.25, 0.25, 0.25), (0.25, 0.25, 0.25)]
    args.synopsis = "panorama"
    args.nchannels = 3
    args.facets = [fct]
    args.solo = 0
    plan = build_plan(args, [fct])
    bias = 1.0 / ST.DERIV_BIAS
    spread = tuple((cx * bias, cy * bias, w)
                   for cx, cy, w in plan.spread)
    window = (0, 128, 0, 256)
    geom = fastpath._geom_static(plan)
    basis = fastpath._basis_arg(plan, 0)
    passes, assigned = fastpath.plan_passes(
        plan, src, window, fastpath.DEFAULT_CLASSES, spread=spread)
    assert (assigned >= 0).all()
    tested = 0
    for name, wc, box, tiles, merge in passes:
        assert fastpath._inline_eligible(plan, src, 0, name, spread,
                                         merge)
        spl = fastpath._variant_spline(src, name)
        stt = src.static
        statics = (stt.total_extent.x0, stt.total_extent.x1,
                   stt.total_extent.y0, stt.total_extent.y1,
                   stt.total_width, stt.total_height,
                   stt.window_x_offset, stt.window_y_offset)
        tmode, xfeat, yfeat, P, consts = fastpath._inline_setup(
            geom, window, name, spl.core_shape, spl.pad,
            tuple(spl.bcs), statics, twined=True)
        faces = np.zeros(tiles.shape[0], np.int32)
        bas = np.asarray(basis, np.float32)
        if name.startswith("pitched"):
            bas = np.asarray(fastpath.PITCH_BASIS.T, np.float32) @ bas
        bm = np.einsum("ij,fjk->fik", bas, P).reshape(-1, 9)
        coeffp = jnp.moveaxis(spl.coeff, -1, 0)
        canvas = jnp.zeros((coeffp.shape[0], 128, 256), jnp.float32)
        spread_flat = jnp.asarray(
            np.asarray(spread, np.float32).ravel())
        out = PR.resample_inline_twined_into(
            canvas, coeffp, jnp.asarray(tiles), jnp.asarray(faces),
            jnp.asarray(xfeat), jnp.asarray(yfeat), jnp.asarray(bm),
            spread_flat, jnp.float32(0), degree=spl.degree,
            n_taps=len(spread), tmode=tmode, consts=consts, wc=wc,
            interpret=True)
        out = np.moveaxis(np.asarray(out), 0, -1)

        # XLA reference: coordinate passes + tap loop
        c0 = fastpath._coords(geom, window, name, src, 0,
                              (0.0, 0.0), basis)
        c10 = fastpath._coords(geom, window, name, src, 0,
                               (ST.DERIV_BIAS, 0.0), basis)
        c01 = fastpath._coords(geom, window, name, src, 0,
                               (0.0, ST.DERIV_BIAS), basis)
        dux, dvx = fastpath._deriv(c0[0], c10[0], c01[0])
        duy, dvy = fastpath._deriv(c0[1], c10[1], c01[1])
        sspl = S.Spline2D(coeff=spl.coeff, pad=0, degree=spl.degree,
                          bcs=(S.CONSTANT, S.CONSTANT),
                          core_shape=spl.coeff.shape[:2])
        ref = None
        for cx, cy, wgt in spread:
            v = S.eval_spline(sspl, c0[0] + cx * dux + cy * dvx,
                              c0[1] + cx * duy + cy * dvy,
                              apply_gate=False)
            ref = wgt * v if ref is None else ref + wgt * v
        ref = np.asarray(ref)
        for row in np.asarray(tiles):
            osl = np.s_[row[2]*PR.TILE_H:(row[2]+1)*PR.TILE_H,
                        row[3]*PR.TILE_W:(row[3]+1)*PR.TILE_W]
            np.testing.assert_allclose(out[osl], ref[osl], atol=3e-3)
        tested += 1
    assert tested


def test_resample_inline_cubemap_source():
    """Inline-coordinates kernel with the cubemap/biatan6 SOURCE
    pickup fused in (dominant-axis face selection + in-face division +
    per-face section offset in-kernel) vs the XLA _coords +
    eval_spline path."""
    import math

    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_extent, get_step
    from envutil_tpu.models import cubemap as CBM
    from envutil_tpu.runtime import fastpath
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.render import build_plan

    rng = np.random.default_rng(11)
    faces6 = np.stack([rng.uniform(0, 1, (128, 128, 3))
                       .astype(np.float32) for _ in range(6)])
    for sproj in (Projection.CUBEMAP, Projection.BIATAN6):
        cfct = Facet(facet_no=0, nchannels=3)
        cfct.set_geometry(sproj, 128, 6 * 128, math.pi / 2)
        cfct.step = get_step(sproj, 128, 6 * 128, math.pi / 2)
        cfct.yaw = math.radians(15)
        cfct.process_geometry()
        src = CBM.make_cubemap_source(cfct, faces6, 3, 3, 16, 16)

        args = Args()
        args.projection = Projection.RECTILINEAR
        args.width = args.height = 256
        args.hfov = math.radians(70)
        args.extent = get_extent(args.projection, 256, 256, args.hfov)
        args.step = (args.extent.x1 - args.extent.x0) / 256
        args.spline_degree = args.prefilter_degree = 3
        args.twine = 0
        args.synopsis = "panorama"
        args.nchannels = 3
        args.facets = [cfct]
        args.solo = 0
        plan = build_plan(args, [cfct])
        window = (0, 256, 0, 256)
        geom = fastpath._geom_static(plan)
        basis = fastpath._basis_arg(plan, 0)
        passes, assigned = fastpath.plan_passes(
            plan, src, window, fastpath.DEFAULT_CLASSES)
        tested = 0
        for name, wc, box, tiles, merge in passes:
            smode = fastpath._inline_eligible(plan, src, 0, name,
                                              None, merge)
            if smode is None:
                continue
            assert smode == ("biatan6"
                             if sproj == Projection.BIATAN6
                             else "cubemap")
            spl = fastpath._variant_spline(src, name)
            m = src.static.metrics
            statics = (m.refc_md, m.model_to_px, m.section_px)
            tmode, xfeat, yfeat, P, consts = fastpath._inline_setup(
                geom, window, name, spl.core_shape, spl.pad,
                tuple(spl.bcs), statics, smode=smode)
            faces = np.zeros(tiles.shape[0], np.int32)
            bas = np.asarray(basis, np.float32)
            bm = np.einsum("ij,fjk->fik", bas, P).reshape(-1, 9)
            coeffp = jnp.moveaxis(spl.coeff, -1, 0)
            canvas = jnp.zeros((coeffp.shape[0], 256, 256),
                               jnp.float32)
            out = PR.resample_inline_into(
                canvas, coeffp, jnp.asarray(tiles),
                jnp.asarray(faces), jnp.asarray(xfeat),
                jnp.asarray(yfeat), jnp.asarray(bm),
                jnp.float32(0), degree=spl.degree, tmode=tmode,
                consts=consts, smode=smode, wc=wc, interpret=True)
            out = np.moveaxis(np.asarray(out), 0, -1)
            rsx, rsy, _m, _z = fastpath._coords(
                geom, window, name, src, 0, (0.0, 0.0), basis)
            ref = np.asarray(S.eval_spline(
                S.Spline2D(coeff=spl.coeff, pad=0, degree=spl.degree,
                           bcs=(S.CONSTANT, S.CONSTANT),
                           core_shape=spl.coeff.shape[:2]),
                rsx, rsy, apply_gate=False))
            for row in np.asarray(tiles):
                osl = np.s_[row[2]*PR.TILE_H:(row[2]+1)*PR.TILE_H,
                            row[3]*PR.TILE_W:(row[3]+1)*PR.TILE_W]
                np.testing.assert_allclose(out[osl], ref[osl],
                                           atol=3e-3)
            tested += 1
        assert tested, f"no inline-eligible pass for {sproj} source"
