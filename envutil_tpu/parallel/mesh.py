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

For sources too large to replicate (16K+), shard the coefficient table
over the same axis and all_gather the support halo - planned follow-up
(SURVEY.md section 5 'long-sequence analog').
"""

from __future__ import annotations

from typing import List, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import environment as E
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
