"""Decompose the 16K twined frame's wall time on chip: time the
chained loop with (a) planar finish (no moveaxis/repix, no canvas
reuse - fresh zeros each frame), (b) the bench's materialized-finish
reuse contract, and (c) the old scalar-carry contract that lets XLA
slice the finish away. Localizes the ~1 ms gap between the profiler's
device-busy kernel total and the bench wall time.

Usage: python tools/probe_twined_finish.py [runs]
"""

import os
import sys
import time


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_mosaic import build_twine16
    import jax
    import jax.numpy as jnp
    from envutil_tpu.runtime import fastpath as FP

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    frame_fn, state, passes, assigned, n_px = build_twine16()

    def timed(loop, *args):
        float(loop(*args))
        t0 = time.perf_counter()
        float(loop(*args))
        dt = (time.perf_counter() - t0) / runs
        return dt * 1e3, n_px / 1e6 / dt

    # (c) old contract: scalar carry, finish sliced away
    @jax.jit
    def loop_old(st):
        def body(i, carry):
            img = frame_fn(st, carry * 1e-30)
            return carry + img.ravel()[0]
        return jax.lax.fori_loop(0, runs, body, jnp.float32(0))

    ms, rate = timed(loop_old, state)
    print(f"old contract (finish sliced): {ms:7.3f} ms  "
          f"{rate:7.1f} Mpix/s", flush=True)

    # (b) materialized finish, image carried
    @jax.jit
    def loop_img(st, im0):
        def body(i, img):
            return frame_fn(st, img.ravel()[0] * 1e-30)
        return jax.lax.fori_loop(0, runs, body, im0).ravel()[0]

    img0 = jax.block_until_ready(frame_fn(state, jnp.float32(0)))
    ms, rate = timed(loop_img, state, img0)
    print(f"materialized finish:          {ms:7.3f} ms  "
          f"{rate:7.1f} Mpix/s", flush=True)

    # (a) planar finish (kernels + mask only, no relayout)
    pl_fn, pl_state, _a, _p = FP.fused_frame(
        build_twine16.plan, build_twine16.src, build_twine16.window,
        spread=build_twine16.spread, finish="planar")

    @jax.jit
    def loop_pl(st, im0):
        def body(i, img):
            return pl_fn(st, img.ravel()[0] * 1e-30)
        return jax.lax.fori_loop(0, runs, body, im0).ravel()[0]

    img0 = jax.block_until_ready(pl_fn(pl_state, jnp.float32(0)))
    ms, rate = timed(loop_pl, pl_state, img0)
    print(f"planar finish (carried):      {ms:7.3f} ms  "
          f"{rate:7.1f} Mpix/s", flush=True)


if __name__ == "__main__":
    main()
