"""Pass-planner logic tests: launch-count consolidation
(fastpath._consolidate_passes), pass-fitted class shrinking
(fastpath._shrink_passes), and the deeper-band shear classes - the
host-side decisions that route tiles onto the Pallas kernels. Value
checks run the kernels in interpreter mode at degree 1 (one compile is
~25s on this VM; the planner-only checks are instant).

Reference analog: the per-ISA consistency discipline of geometry.cc
(geometry.cc:1197-1213) - every planning variation must reproduce the
same image bit-for-bit, because it only reroutes tiles between
admissible kernel configurations.
"""

import math
import os

import numpy as np
import pytest

from envutil_tpu.core.conventions import Projection
from envutil_tpu.core.facet import Facet
from envutil_tpu.core.metrics import get_extent, get_step
from envutil_tpu.models import environment as E
from envutil_tpu.models import stepper as ST
from envutil_tpu.ops import pallas_resample as PR
from envutil_tpu.runtime import fastpath
from envutil_tpu.runtime.args import Args
from envutil_tpu.runtime.render import build_plan

RNG = np.random.default_rng(11)


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    monkeypatch.setattr(PR, "FORCE_INTERPRET", True)


@pytest.fixture
def _fresh_caches():
    fastpath._FRAME_CACHE.clear()
    fastpath._LADDER_CACHE.clear()
    yield
    fastpath._FRAME_CACHE.clear()
    fastpath._LADDER_CACHE.clear()


def _mk_sph_source(w=512, h=256, degree=1):
    img = RNG.uniform(0, 1, (h, w, 3)).astype(np.float32)
    fct = Facet(facet_no=0, nchannels=3)
    fct.set_geometry(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.step = get_step(Projection.SPHERICAL, w, h, 2 * math.pi)
    fct.process_geometry()
    return fct, E.make_mount_source(fct, img, degree, degree)


def _mk_plan(fct, w, h, hfov_deg, yaw_deg=0.0, pitch_deg=0.0,
             degree=1, twine=0):
    args = Args()
    args.projection = Projection.RECTILINEAR
    args.width, args.height = w, h
    args.hfov = math.radians(hfov_deg)
    args.extent = get_extent(args.projection, w, h, args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / w
    args.yaw = math.radians(yaw_deg)
    args.pitch = math.radians(pitch_deg)
    args.spline_degree = args.prefilter_degree = degree
    args.nchannels = 3
    args.twine = twine
    args.facets = [fct]
    args.solo = 0
    if twine:
        args.twine_setup()
    return build_plan(args, [fct])


def _plan_with(plan, src, window, spread=None, consolidate=True,
               shrink=True):
    old_c = os.environ.get("ENVUTIL_NO_CONSOLIDATE")
    old_s = os.environ.get("ENVUTIL_NO_SHRINK")
    os.environ["ENVUTIL_NO_CONSOLIDATE"] = "" if consolidate else "1"
    os.environ["ENVUTIL_NO_SHRINK"] = "" if shrink else "1"
    try:
        return fastpath.plan_passes(plan, src, window,
                                    fastpath.DEFAULT_CLASSES,
                                    spread=spread)
    finally:
        for k, v in (("ENVUTIL_NO_CONSOLIDATE", old_c),
                     ("ENVUTIL_NO_SHRINK", old_s)):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_consolidation_merges_passes():
    """A frame whose unconsolidated plan carries a small second pass
    must fold it into the first (the merge is provably applied), and
    every merged tile must still classify fast under the absorbing
    class (the feasibility contract of _consolidate_passes)."""
    fct, src = _mk_sph_source()
    plan = _mk_plan(fct, 384, 256, 120, yaw_deg=30, pitch_deg=10)
    window = (0, 256, 0, 384)
    p0, a0 = _plan_with(plan, src, window, consolidate=False,
                        shrink=False)
    p1, a1 = _plan_with(plan, src, window, consolidate=True,
                        shrink=False)
    assert len(p0) >= 2, "config no longer produces a multi-pass plan"
    assert len(p1) < len(p0), "consolidation did not fire"
    # same tiles covered, no tile lost or re-routed to the fallback
    assert ((a0 == -1) == (a1 == -1)).all()
    assert ((a0 == fastpath.ZERO_PASS)
            == (a1 == fastpath.ZERO_PASS)).all()
    total0 = sum(t.shape[0] for _n, _w, _b, t, _m in p0)
    total1 = sum(t.shape[0] for _n, _w, _b, t, _m in p1)
    assert total0 == total1


def test_consolidation_bit_equal(_fresh_caches):
    """Rendered frame with consolidation ON equals the frame with
    consolidation OFF bit-for-bit: the merged pass re-derives window
    origins from the same classifier statistics, so only the launch
    count changes (interpreter mode, degree 1)."""
    fct, src = _mk_sph_source()
    plan = _mk_plan(fct, 384, 256, 120, yaw_deg=30, pitch_deg=10)
    window = (0, 256, 0, 384)
    p0, _a0 = _plan_with(plan, src, window, consolidate=False,
                         shrink=False)
    p1, _a1 = _plan_with(plan, src, window, consolidate=True,
                         shrink=False)
    assert len(p1) < len(p0), "consolidation did not fire"
    old = os.environ.get("ENVUTIL_NO_SHRINK")
    os.environ["ENVUTIL_NO_SHRINK"] = "1"
    try:
        os.environ["ENVUTIL_NO_CONSOLIDATE"] = "1"
        img0 = fastpath.render_fast(plan, [src], verbose=True)
        fastpath._FRAME_CACHE.clear()
        os.environ["ENVUTIL_NO_CONSOLIDATE"] = ""
        img1 = fastpath.render_fast(plan, [src], verbose=True)
    finally:
        os.environ.pop("ENVUTIL_NO_CONSOLIDATE", None)
        if old is None:
            os.environ.pop("ENVUTIL_NO_SHRINK", None)
        else:
            os.environ["ENVUTIL_NO_SHRINK"] = old
    assert img0 is not None and img1 is not None
    np.testing.assert_array_equal(img0, img1)


def test_shrink_fits_within_admission():
    """Pass-fitted classes (_shrink_passes) never exceed the original
    budgets, and every tile still classifies fast under the fitted
    class - the exactness contract (same admission formulas at
    equality)."""
    fct, src = _mk_sph_source(2048, 1024)
    plan = _mk_plan(fct, 256, 256, 100, degree=1, twine=-1)
    window = (0, 256, 0, 256)
    bias = 1.0 / ST.DERIV_BIAS
    spread = tuple((bias * cx, bias * cy, w)
                   for cx, cy, w in plan.spread)
    p0, a0 = _plan_with(plan, src, window, spread=spread,
                        shrink=False)
    p1, a1 = _plan_with(plan, src, window, spread=spread, shrink=True)
    assert (a0 == a1).all()
    shrunk_any = False
    for (n0, w0, _b0, t0, _m0), (n1, w1, _b1, t1, _m1) in zip(p0, p1):
        assert n0 == n1
        assert t0.shape[0] == t1.shape[0]
        for f in ("win_h", "win_w", "cand_r", "cand_c", "k_taps",
                  "shear_q", "u_span"):
            assert getattr(w1, f) <= getattr(w0, f), (f, w0, w1)
        if w1 != w0:
            shrunk_any = True
            assert w1.win_h % 8 == 0 and w1.win_w % 128 == 0
            assert w1.win_h >= 8 * w1.cand_r
            assert w1.win_w >= 128 * w1.cand_c
    assert shrunk_any, "the minified twined plan no longer shrinks"


def test_shrink_value_equal(_fresh_caches):
    """Rendered frame with pass-fitting ON equals the frame with
    fitting OFF: dropped candidate blocks and tap columns carried
    exactly zero weight, so the only residual is XLA's per-program
    FMA-contraction choice between the two window shapes (<= 2 ulp,
    like every cross-program comparison in this suite)."""
    fct, src = _mk_sph_source()
    plan = _mk_plan(fct, 256, 128, 60, yaw_deg=15, pitch_deg=5)
    old = os.environ.get("ENVUTIL_NO_SHRINK")
    try:
        os.environ["ENVUTIL_NO_SHRINK"] = "1"
        img0 = fastpath.render_fast(plan, [src], verbose=True,
                                    classes=(PR.TIGHT,))
        fastpath._FRAME_CACHE.clear()
        os.environ["ENVUTIL_NO_SHRINK"] = ""
        img1 = fastpath.render_fast(plan, [src], verbose=True,
                                    classes=(PR.TIGHT,))
    finally:
        if old is None:
            os.environ.pop("ENVUTIL_NO_SHRINK", None)
        else:
            os.environ["ENVUTIL_NO_SHRINK"] = old
    assert img0 is not None and img1 is not None
    np.testing.assert_allclose(img1, img0, rtol=4e-7, atol=4e-7)
