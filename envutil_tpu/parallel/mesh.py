"""Multi-chip rendering: shard the output raster over a device mesh.

The reference's only scale-out axes are SIMD lanes and a thread pool
over output segments (SURVEY.md 2.7); the honest TPU-native analogue is
SPMD over the output raster: each chip renders a horizontal band of the
target, facet coefficient arrays replicated (they are read-only
gather tables). XLA partitions the elementwise ray math spatially and
keeps gathers local because the operands are replicated - no
collectives on the forward path, which is exactly the reference's
zero-communication tile decomposition (wielding.h:240-265), ridden on
the ICI mesh instead of a thread pool.

For sources too large to replicate (16K+), ``ring_spline_eval`` shards
the coefficient table itself in row bands over the same axis and
ring-rotates the bands through every chip with ``ppermute`` over ICI,
accumulating each band's partial tensor-product sums - the reference's
out-of-core tile store (zimt/tiles.h) promoted to the device mesh
(SURVEY.md section 5 'long-sequence analog'): peak per-chip residency
is two bands instead of the whole table.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import environment as E
from ..ops import spline as S
from ..runtime.render import RenderPlan, _render_window


def make_mesh(devices: Optional[list] = None, axis: str = "rows") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def sharded_render(plan: RenderPlan, sources: List[E.FacetSource],
                   mesh: Mesh, axis: str = "rows"):
    """Jit the full-frame render with the output sharded over ``axis``
    (rows of the target raster) and sources replicated. Returns the
    compiled callable; call it with the sources list."""
    n = mesh.shape[axis]
    height = plan.height if plan.crop is None else \
        (plan.crop[1] - plan.crop[0])
    assert height % n == 0, \
        f"output height {height} must divide the mesh axis {n}"

    window = None if plan.crop is None else \
        (plan.crop[0], plan.crop[1], plan.crop[2], plan.crop[3])

    out_sharding = NamedSharding(mesh, P(axis, None, None))
    repl = NamedSharding(mesh, P())

    def fn(srcs):
        return _render_window(plan, srcs, window)

    flat, _ = jax.tree_util.tree_flatten(sources)
    in_shardings = jax.tree_util.tree_map(lambda _: repl, sources)
    return jax.jit(fn, in_shardings=(in_shardings,),
                   out_shardings=out_sharding)


def replicate_sources(sources: List[E.FacetSource], mesh: Mesh
                      ) -> List[E.FacetSource]:
    repl = NamedSharding(mesh, P())
    return jax.device_put(sources, jax.tree_util.tree_map(
        lambda _: repl, sources))


# ---------------------------------------------------------------------------
# facet-sharded evaluation: ring-rotated coefficient bands over ICI
# ---------------------------------------------------------------------------

def shard_spline_rows(spl: S.Spline2D, mesh: Mesh, axis: str = "rows"
                      ) -> S.Spline2D:
    """Shard a spline's padded coefficient table in row bands over the
    mesh axis (padding the row count to a multiple of the axis size;
    the pad rows are never addressed - row indices are clamped to the
    real table). The returned spline is only evaluable through
    ring_spline_eval."""
    n = mesh.shape[axis]
    hp, wp, ch = spl.coeff.shape
    b = -(-hp // n)
    coeff = spl.coeff
    if b * n != hp:
        coeff = jnp.pad(coeff, ((0, b * n - hp), (0, 0), (0, 0)))
    coeff = jax.device_put(coeff, NamedSharding(mesh, P(axis, None,
                                                        None)))
    return S.Spline2D(coeff=coeff, pad=spl.pad, degree=spl.degree,
                      bcs=spl.bcs, core_shape=spl.core_shape)


def ring_spline_eval(spl: S.Spline2D, x, y, mesh: Mesh,
                     axis: str = "rows"):
    """Exact gated b-spline evaluation with the coefficient table
    sharded in row bands over ``axis`` (shard_spline_rows) and the
    output raster rows sharded over the same axis.

    N ring steps: at step s each chip holds band ``(d + s) % N``,
    accumulates the partial tensor-product sum of the vertical taps
    whose source rows live in that band, and passes the band to its
    ring neighbor (``lax.ppermute`` - one hop over ICI). Taps whose
    support straddles a band boundary are completed when the
    neighboring band arrives, so no halo copies are needed and the sum
    is exactly eval_spline's. Per-chip HBM residency: two bands
    (compute + in-flight) instead of the whole table - the scaling
    path for 16K+ sources; compute cost is N partial passes, so use
    the smallest mesh that fits the table."""
    n = spl.degree
    h, w = spl.core_shape
    x = S.gate(x, spl.bcs[1], w)
    y = S.gate(y, spl.bcs[0], h)
    nd = mesh.shape[axis]
    hp, wp, ch = spl.coeff.shape  # hp already padded to nd * band
    band_h = hp // nd
    real_h = spl.core_shape[0] + 2 * spl.pad

    def run(band, xl, yl):
        d = jax.lax.axis_index(axis)
        sx, tx = S.split(xl, n)
        sy, ty = S.split(yl, n)
        wx = S._weights(tx, n)
        wy = S._weights(ty, n)
        # integer pad shift after the split (exact, matching
        # eval_spline's bx = sx + (pad - n // 2))
        off = spl.pad - n // 2
        by = jnp.clip(sy + off, 0, real_h - 1 - n)
        bx = jnp.clip(sx + off, 0, wp - 1 - n)

        def body(s, carry):
            acc, bnd = carry
            owner = jax.lax.rem(d + s.astype(jnp.int32),
                                jnp.int32(nd))
            row0 = owner * band_h
            flat = bnd.reshape(band_h * wp, ch)
            contrib = jnp.zeros_like(acc)
            for j in range(n + 1):
                row = jnp.minimum(by + j, real_h - 1)
                m = (row >= row0) & (row < row0 + band_h)
                lr = jnp.clip(row - row0, 0, band_h - 1)
                racc = None
                for k in range(n + 1):
                    cx = jnp.minimum(bx + k, wp - 1)
                    idx = (lr * wp + cx).reshape(-1)
                    tap = jnp.take(flat, idx, axis=0, mode="clip")
                    tap = tap.reshape(lr.shape + (ch,))
                    term = wx[k][..., None] * tap
                    racc = term if racc is None else racc + term
                wj = jnp.where(m, wy[j], 0.0)
                contrib = contrib + wj[..., None] * racc
            bnd = jax.lax.ppermute(
                bnd, axis, [(i, (i - 1) % nd) for i in range(nd)])
            return acc + contrib, bnd

        acc0 = jnp.zeros(xl.shape + (ch,), jnp.float32)
        # the loop carry becomes device-varying after the first
        # ppermute; mark the initial carry accordingly
        if hasattr(jax.lax, "pcast"):
            acc0 = jax.lax.pcast(acc0, (axis,), to="varying")
        elif hasattr(jax.lax, "pvary"):
            acc0 = jax.lax.pvary(acc0, (axis,))
        acc, _ = jax.lax.fori_loop(0, nd, body, (acc0, band))
        return acc

    fn = shard_map(run, mesh=mesh,
                   in_specs=(P(axis, None, None), P(axis, None),
                             P(axis, None)),
                   out_specs=P(axis, None, None))
    return fn(spl.coeff, x, y)
