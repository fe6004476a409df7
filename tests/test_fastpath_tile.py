"""Always-on fused-frame kernel-arithmetic check.

The full interpreter-mode product suite (test_fastpath_interpret.py) is
opt-in because its frames compile for minutes; this module keeps ONE
cheap case per kernel flavour in the default run: a single 128x128
output tile driven through the real production pipeline (plan_passes ->
fused_frame -> Pallas kernel in interpreter mode) and compared against
the exact XLA graph, so the default suite executes the fused kernel's
arithmetic - both the plain kernel and the inline-coordinates variant.

Degree 1 keeps the interpreter compile ~25s/case (degree 3 compiles
for minutes even on one tile; its kernel arithmetic is covered at unit
granularity by test_pallas_resample.py and end-to-end by the opt-in
interpreter suite / the on-chip checks).
"""

import math

import numpy as np
import pytest

from envutil_tpu.core.conventions import Projection
from envutil_tpu.core.facet import Facet
from envutil_tpu.core.metrics import get_extent, get_step
from envutil_tpu.models import environment as E
from envutil_tpu.ops import pallas_resample as PR
from envutil_tpu.runtime import fastpath
from envutil_tpu.runtime.args import Args
from envutil_tpu.runtime.render import _render_window, build_plan


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setattr(PR, "FORCE_INTERPRET", True)


def _mk_source(projection, w, h, hfov, seed=0, degree=1):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    fct = Facet(facet_no=seed, nchannels=3)
    fct.set_geometry(projection, w, h, hfov)
    fct.step = get_step(projection, w, h, hfov)
    fct.process_geometry()
    return fct, E.make_mount_source(fct, img, degree, degree)


def _mk_plan(fct, degree=1, yaw=0.2, pitch=-0.1):
    args = Args()
    args.projection = Projection.RECTILINEAR
    args.width = args.height = 128
    args.hfov = math.radians(40)
    args.extent = get_extent(args.projection, 128, 128, args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / 128
    args.spline_degree = args.prefilter_degree = degree
    args.twine = 0
    args.synopsis = "panorama"
    args.nchannels = 3
    args.yaw, args.pitch = yaw, pitch
    args.facets = [fct]
    args.solo = 0
    return build_plan(args, [fct])


@pytest.mark.parametrize("src_projection", ["spherical", "rectilinear"])
def test_fused_single_tile_matches_xla(src_projection):
    """One output tile through the production fused path (interpreter
    mode). The spherical source engages the inline-coordinates kernel
    (in-kernel atan2, ~2 ulp vs XLA); the rectilinear source the plain
    kernel on XLA-computed coordinates."""
    if src_projection == "spherical":
        fct, src = _mk_source(Projection.SPHERICAL, 256, 128,
                              2 * math.pi)
    else:
        fct, src = _mk_source(Projection.RECTILINEAR, 192, 160,
                              math.radians(100))
    plan = _mk_plan(fct)

    out = fastpath.render_fast(plan, [src], verbose=True,
                               classes=(PR.TIGHT,))
    assert out is not None, "single tile did not classify TIGHT"
    assert out.shape == (128, 128, 3)

    ref = np.asarray(_render_window(plan, [src],
                                    (0, 128, 0, 128)), np.float32)
    np.testing.assert_allclose(out, ref, atol=1e-4)
