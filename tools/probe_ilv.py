"""Micro-probe for the in-kernel interleaved finish emit cost.

Times resample_planar_into on a synthetic all-fused tile grid with
interleave OFF (planar canvas) and ON (gather emit), and reports
per-tile microseconds plus the implied full-frame delta for the 8K
headline (1536 tiles). Measured on a v5e (2026-08-21): the gather
emit costs +0.76 (TIGHT) to +1.36 (MID) us/tile = +1.2..+2.1 ms on
the headline - more than the 0.95 ms XLA relayout it replaces, which
is why the in-kernel interleave is opt-in (PR._ILV_ON).

Usage: python tools/probe_ilv.py [ntiles] [degree]
"""

import functools
import os
import sys
import time

import numpy as np


def main():
    from envutil_tpu.runtime.platform import ensure_backend
    ensure_backend()
    import jax
    import jax.numpy as jnp

    from envutil_tpu.ops import pallas_resample as PR
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from probe_kernel import make_case

    nt = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    deg = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    coeff, sx, sy, tiles = make_case(8, 8, nt=nt)
    h, w = sx.shape
    runs = 48

    def timeit(fn, canvas0):
        @jax.jit
        def loop(cv0, a):
            def body(i, cv):
                return fn(cv, a[0], a[1], a[2],
                          cv.ravel()[0] * 1e-30)
            return jax.lax.fori_loop(0, runs, body, cv0).ravel()[0]

        args = (coeff, sx, sy)
        float(loop(canvas0, args))
        t0 = time.perf_counter()
        float(loop(canvas0, args))
        return (time.perf_counter() - t0) / runs

    print(f"nt={nt} deg={deg}", flush=True)
    for wc in (PR.TIGHT, PR.MID):
        def f_pl(cv, c, x, y, eps):
            return PR.resample_planar_into(
                cv, c, x + eps, y, tiles, degree=deg, wc=wc,
                unroll=True, interleave=False)

        def f_il(cv, c, x, y, eps):
            return PR.resample_planar_into(
                cv, c, x + eps, y, tiles, degree=deg, wc=wc,
                unroll=True, interleave=True)

        dt_pl = timeit(f_pl, jnp.zeros((3, h, w), jnp.float32))
        dt_il = timeit(f_il, jnp.zeros((h, 3 * w), jnp.float32))
        per_pl = dt_pl * 1e6 / nt
        per_il = dt_il * 1e6 / nt
        print(f"  {wc.name}: planar {per_pl:7.3f} us/tile   "
              f"ilv {per_il:7.3f} us/tile   "
              f"delta {per_il - per_pl:+.3f} us/tile "
              f"(headline x1536 = {(per_il - per_pl) * 1536e-3:+.2f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
