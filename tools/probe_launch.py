"""Isolate the inter-pass launch overhead: run the SAME total tile
work as 1, 2, 4, or 8 chained resample_planar_into passes over one
aliased canvas, for small and large canvases. If the per-pass gap is
a fixed launch cost it shows up canvas-independent; if XLA inserts a
canvas copy between passes it scales with canvas bytes.

Usage: python tools/probe_launch.py [ntiles]
"""

import sys
import time

import numpy as np


def main():
    from envutil_tpu.runtime.platform import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp

    from envutil_tpu.ops import pallas_resample as PR
    import os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from probe_kernel import make_case

    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    deg = 3
    runs = 48
    # distinct=1: each pass uses a DIFFERENT window class (distinct
    # Mosaic kernels, like a real planned frame); default: all passes
    # share one class (isolates pure launch count)
    distinct = os.environ.get("PROBE_DISTINCT") == "1"
    ladder = (PR.TIGHT, PR.MID, PR.LOCAL, PR.ROWS4, PR.ROWS6,
              PR.ALIGNED, PR.MINIFY, PR.STEEP)

    for nty, ntx, label in ((8, 8, "canvas 1024x1024"),
                            (16, 20, "canvas 2048x2560")):
        coeff, sx, sy, tiles = make_case(nty, ntx, nt=nt)
        h, w = sx.shape
        for nsplit in (1, 2, 4, 8):
            # UNEQUAL splits: distinct static nt per pass -> distinct
            # compiled Mosaic kernels even for one class (equal splits
            # would share a single kernel, hiding any per-program
            # switch cost)
            t = np.asarray(tiles)
            cuts = np.cumsum(np.arange(1, nsplit) * 2
                             + nt // nsplit - nsplit + 1)
            parts = [jnp.asarray(p) for p in np.split(t, cuts)
                     if p.shape[0]]

            def f(cv, c, x, y, eps):
                x = x + eps
                for i, p in enumerate(parts):
                    wc = ladder[i] if distinct else PR.TIGHT
                    cv = PR.resample_planar_into(
                        cv, c, x, y, p, degree=deg, wc=wc,
                        unroll=True)
                return cv

            @jax.jit
            def loop(cv0, a):
                def body(i, cv):
                    return f(cv, a[0], a[1], a[2],
                             cv.ravel()[0] * 1e-30)
                return jax.lax.fori_loop(0, runs, body,
                                         cv0).ravel()[0]

            args = (coeff, sx, sy)
            cv0 = jnp.zeros((3, h, w), jnp.float32)
            float(loop(cv0, args))
            t0 = time.perf_counter()
            float(loop(cv0, args))
            dt = (time.perf_counter() - t0) / runs
            print(f"{label}  passes={nsplit}: {dt * 1e6:9.1f} us/frame",
                  flush=True)


if __name__ == "__main__":
    main()
