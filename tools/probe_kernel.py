"""Kernel micro-probe: correctness of the double-buffered compact-grid
kernel vs the XLA spline path, and per-(window-class, unroll) per-tile
cost on the real chip. Development tool, not part of the benchmark
surface."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from envutil_tpu.ops import pallas_resample as PR
from envutil_tpu.ops import spline as S

DEG = 3


def make_case(nty=8, ntx=8, nt=None):
    rng = np.random.default_rng(0)
    coeff = rng.uniform(0, 1, (3, 4096, 8192)).astype(np.float32)
    h, w = nty * PR.TILE_H, ntx * PR.TILE_W
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # gentle warp, in-budget for every class; coords relative to a
    # per-tile origin laid out on a coarse source grid
    tiles = []
    sx = np.empty((h, w), np.float32)
    sy = np.empty((h, w), np.float32)
    k = 0
    n_rows = nt if nt is not None else nty * ntx
    for t in range(n_rows):
        iby, ibx = divmod(t % (nty * ntx), ntx)
        oy = (iby * 256) % 2048
        ox = (ibx * 384) % 4096
        ys = slice(iby * PR.TILE_H, (iby + 1) * PR.TILE_H)
        xs = slice(ibx * PR.TILE_W, (ibx + 1) * PR.TILE_W)
        ly = yy[ys, xs] - iby * PR.TILE_H
        lx = xx[ys, xs] - ibx * PR.TILE_W
        sx[ys, xs] = ox + 8.0 + 0.92 * lx + 0.05 * ly
        sy[ys, xs] = oy + 8.0 + 0.91 * ly + 0.04 * lx
        tiles.append((iby, ibx, iby, ibx, oy, ox))
        k += 1
    tiles = np.asarray(tiles, np.int32)
    return (jnp.asarray(coeff), jnp.asarray(sx), jnp.asarray(sy),
            jnp.asarray(tiles))


def check_correct(coeff, sx, sy, tiles):
    canvas = jnp.zeros((3, sx.shape[0], sx.shape[1]), jnp.float32)
    for wc in (PR.TIGHT, PR.LOCAL, PR.SHEAR4, PR.SHEAR_LOCAL_3):
        t = _extend(tiles, sx, sy, wc) if wc.shear_q else tiles
        out = PR.resample_planar_into(canvas, coeff, sx, sy, t,
                                      degree=DEG, wc=wc)
        spl = S.Spline2D(coeff=jnp.moveaxis(coeff, 0, -1), pad=0,
                         degree=DEG, bcs=(S.CONSTANT, S.CONSTANT),
                         core_shape=coeff.shape[1:])
        ref = S.eval_spline(spl, sx, sy, apply_gate=False)
        ref = jnp.moveaxis(ref, -1, 0)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"  {wc.name}: max err {err:.2e}", flush=True)
        assert err < 1e-4, wc.name


def _extend(tiles, sx, sy, wc):
    stats = [np.asarray(s) for s in PR.tile_stats_fit(sx, sy, DEG)]
    if wc.shear_q:
        ext = PR.row_block_shear(stats, np.asarray(tiles), DEG, wc)
    else:
        ext = PR.row_block_origins(stats, np.asarray(tiles), DEG, wc)
    return jnp.asarray(np.concatenate([np.asarray(tiles), ext], 1))


def time_class(coeff, sx, sy, tiles, wc, unroll, runs=4, ext=True):
    if ext:
        tiles = _extend(tiles, sx, sy, wc)
    canvas = jnp.zeros((3, sx.shape[0], sx.shape[1]), jnp.float32)

    @jax.jit
    def loop(cv, cf, a, b, t):
        def body(i, carry):
            cv2, acc = carry
            out = PR.resample_planar_into(cv2, cf, a + acc * 1e-30, b,
                                          t, degree=DEG, wc=wc,
                                          unroll=unroll)
            return out, acc + out[0, 0, 0]
        return jax.lax.fori_loop(0, runs, body,
                                 (cv, jnp.float32(0)))[1]

    float(loop(canvas, coeff, sx, sy, tiles))
    t0 = time.perf_counter()
    float(loop(canvas, coeff, sx, sy, tiles))
    dt = (time.perf_counter() - t0) / runs
    us_tile = dt / tiles.shape[0] * 1e6
    mpix = tiles.shape[0] * PR.TILE_H * PR.TILE_W / 1e6 / dt
    print(f"  {wc.name} unroll={unroll} ext={ext}: {us_tile:8.1f} "
          f"us/tile ({mpix:7.1f} Mpix/s)", flush=True)
    return us_tile


def main():
    print(f"devices: {jax.devices()}", flush=True)
    coeff, sx, sy, tiles = make_case()
    print("correctness (dbuf kernels vs XLA):", flush=True)
    check_correct(coeff, sx, sy, tiles)

    # timing on a larger grid for steady state
    coeff, sx, sy, tiles = make_case(8, 8, nt=512)
    print("per-class cost (512 tiles):", flush=True)
    for wc in (PR.SHEAR4, PR.SHEAR6, PR.SHEAR6_3, PR.SHEAR_MID,
               PR.SHEAR_LOCAL, PR.SHEAR_LOCAL_3, PR.SHEAR_MINIFY,
               PR.SHEAR_DIAG, PR.TIGHT, PR.ROWS4, PR.ROWS6,
               PR.MID, PR.LOCAL, PR.MINIFY, PR.DIAG):
        for unroll in (False, True):
            time_class(coeff, sx, sy, tiles, wc, unroll)


if __name__ == "__main__":
    main()
