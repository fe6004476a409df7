"""End-to-end fused-path consistency WITHOUT TPU hardware: the fused
frame machinery (plan_passes, union-tap twined kernels, core/band
partial decomposition, champion-stable multi-facet stitching) driven
through fastpath.render_fast with the Pallas kernels in interpreter
mode, compared against the exact XLA graph.

Interpreter-mode fused frames compile for minutes on this single-core
VM, so the tests are opt-in: ENVUTIL_INTERPRET_CHECK=1. CI covers the
kernels in interpreter mode at unit granularity
(test_pallas_resample.py) and the real-TPU check covers the same
end-to-end paths (tools/check_tpu.py via test_tpu_consistency.py).
"""

import math
import os

import numpy as np
import pytest

if os.environ.get("ENVUTIL_INTERPRET_CHECK") != "1":
    pytest.skip("interpreter-mode end-to-end checks are opt-in: set "
                "ENVUTIL_INTERPRET_CHECK=1 (slow)",
                allow_module_level=True)


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64)
                   - np.asarray(b, np.float64)) ** 2)
    return 10 * math.log10(1.0 / mse) if mse > 0 else 999.0


@pytest.fixture(autouse=True)
def _force_interpret(monkeypatch):
    from envutil_tpu.ops import pallas_resample as PR

    monkeypatch.setattr(PR, "FORCE_INTERPRET", True)


def _mk_partial_facet(yaw_deg, seed):
    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.facet import Facet
    from envutil_tpu.core.metrics import get_step
    from envutil_tpu.models import environment as E

    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 1, (384, 512, 3)).astype(np.float32)
    fct = Facet(facet_no=seed, nchannels=3)
    fct.set_geometry(Projection.RECTILINEAR, 512, 384,
                     math.radians(100))
    fct.step = get_step(Projection.RECTILINEAR, 512, 384,
                        math.radians(100))
    fct.yaw = math.radians(yaw_deg)
    fct.process_geometry()
    return fct, E.make_mount_source(fct, img, 3, 3)


def _mk_plan(facets, twine, solo):
    # 512x512 -> 4x4 kernel tiles: big enough that interior /
    # champion-stable tiles exist beside the seam/edge band (at 256
    # every tile touches a boundary and the fused paths never engage)
    from envutil_tpu.core.conventions import Projection
    from envutil_tpu.core.metrics import get_extent
    from envutil_tpu.runtime.args import Args
    from envutil_tpu.runtime.render import build_plan

    args = Args()
    args.projection = Projection.RECTILINEAR
    args.width = args.height = 512
    args.hfov = math.radians(80)
    args.extent = get_extent(args.projection, 512, 512, args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / 512
    args.spline_degree = args.prefilter_degree = 3
    args.nchannels = 3
    args.twine = twine
    if twine:
        args.twine_spread = [(-0.25, -0.25, 0.25), (0.25, -0.25, 0.25),
                             (-0.25, 0.25, 0.25), (0.25, 0.25, 0.25)]
    args.facets = facets
    args.solo = solo
    return build_plan(args, facets)


def test_solo_partial_twined_core_band():
    """Partial facet + twining: interior tiles through the fused
    union-tap kernel, facet-edge band per-tap - must match the exact
    XLA graph (which masks every tap with its own deflected
    validity)."""
    from envutil_tpu.runtime import fastpath
    from envutil_tpu.runtime.render import _compiled_window

    fct, src = _mk_partial_facet(20.0, 1)
    plan = _mk_plan([fct], 1, 0)
    fused = fastpath.render_fast(plan, [src], verbose=True)
    assert fused is not None, "fused path declined"
    xla = np.asarray(_compiled_window(plan, (0, 512, 0, 512))([src]))
    p = psnr(fused, xla)
    assert p > 55.0, f"solo partial twined: only {p:.1f} dB"


def test_multi_twined_champion_stable(capsys):
    """Two-facet twined stitch: champion-stable tiles through each
    facet's solo twined frame, the seam band through the per-tap
    loop - must match the exact XLA per-tap synopsis.

    Yaws -10/+40 put the voronoi seam at +15 deg ~ output column 338,
    >128 px from both the frame border and tile column 1, so facet 0
    owns champion-stable tiles (at a centered seam every 128px tile
    touches the seam or the frame border and the decomposition
    correctly declines)."""
    from envutil_tpu.runtime import fastpath
    from envutil_tpu.runtime.render import _compiled_window

    fct0, src0 = _mk_partial_facet(-10.0, 2)
    fct1, src1 = _mk_partial_facet(40.0, 3)
    plan = _mk_plan([fct0, fct1], 1, -1)
    fused = fastpath.render_fast(plan, [src0, src1], verbose=True)
    assert fused is not None, "fused path declined"
    out = capsys.readouterr().out
    assert "stable tiles" in out, \
        f"champion-stable decomposition did not engage:\n{out}"
    xla = np.asarray(
        _compiled_window(plan, (0, 512, 0, 512))([src0, src1]))
    p = psnr(fused, xla)
    assert p > 55.0, f"champion-stable stitch: only {p:.1f} dB"


def test_solo_partial_twined_mesh_bit_equal():
    """--mesh over the partial twined core/band decomposition: global
    plan band-sliced, per-band fused frames + per-tap-masked edge
    patches - bit-equal to the single-device path."""
    import jax

    from envutil_tpu.runtime import fastpath

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    fct, src = _mk_partial_facet(20.0, 1)
    plan = _mk_plan([fct], 1, 0)
    single = fastpath.render_fast(plan, [src], verbose=True)
    assert single is not None
    meshed = fastpath.render_fast_mesh(plan, [src], 2, verbose=True)
    assert meshed is not None, "twined partial mesh declined"
    np.testing.assert_allclose(meshed, single, rtol=4e-7, atol=4e-7)


def test_multi_twined_champion_stable_mesh_bit_equal(capsys):
    """--mesh over the champion-stable twined stitch: stability and
    all pass plans computed once globally, band-sliced, one compiled
    per-tap frame per band - bit-equal to the single-device frame
    (VERDICT r3 item 2's 'done' case: a fused multi-facet twined mesh
    frame bit-compared to single-device, with the champion-stable
    decomposition engaged)."""
    import jax

    from envutil_tpu.runtime import fastpath

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    fct0, src0 = _mk_partial_facet(-10.0, 2)
    fct1, src1 = _mk_partial_facet(40.0, 3)
    plan = _mk_plan([fct0, fct1], 1, -1)
    single = fastpath.render_fast(plan, [src0, src1], verbose=True)
    assert single is not None
    out = capsys.readouterr().out
    assert "stable tiles" in out, \
        f"champion-stable decomposition did not engage:\n{out}"
    meshed = fastpath.render_fast_mesh(plan, [src0, src1], 2,
                                       verbose=True)
    assert meshed is not None, "pertap mesh declined"
    np.testing.assert_allclose(meshed, single, rtol=4e-7, atol=4e-7)


def test_multi_twined_tapsel_band_ab(capsys, monkeypatch):
    """Champion-routed seam band (tapsel): the voronoi per-tap combine
    regrouped facet-major - sum_f sum_k w_k * [champ_k == f] * v_{f,k}
    - so each facet's band tiles run ONE union-tap kernel instance
    with per-pixel tap weights. Must engage on a two-facet twined
    stitch and match the per-tap loop (ENVUTIL_NO_TAPSEL=1) to
    reassociation level (same taps, same weights; only the summation
    grouping differs)."""
    from envutil_tpu.runtime import fastpath

    fct0, src0 = _mk_partial_facet(-10.0, 2)
    fct1, src1 = _mk_partial_facet(40.0, 3)
    plan = _mk_plan([fct0, fct1], 1, -1)
    new = fastpath.render_fast(plan, [src0, src1], verbose=True)
    assert new is not None, "fused path declined"
    out = capsys.readouterr().out
    assert "champion-routed band tiles" in out, \
        f"tapsel did not engage:\n{out}"
    fastpath._PERTAP_CACHE.clear()
    monkeypatch.setenv("ENVUTIL_NO_TAPSEL", "1")
    old = fastpath.render_fast(plan, [src0, src1], verbose=True)
    assert old is not None
    np.testing.assert_allclose(new, old, rtol=2e-6, atol=2e-6)


def test_multi_untwined_masked_merge():
    """Untwined two-facet stitch with a partial facet: facet-edge
    tiles run as masked MERGE passes (validity-dominance overlays) -
    the one-jit multi frame must match the exact XLA synopsis."""
    from envutil_tpu.runtime import fastpath
    from envutil_tpu.runtime.render import _compiled_window

    fct0, src0 = _mk_partial_facet(-15.0, 4)
    fct1, src1 = _mk_partial_facet(15.0, 5)
    plan = _mk_plan([fct0, fct1], 0, -1)
    fused = fastpath.render_fast(plan, [src0, src1], verbose=True)
    assert fused is not None, "fused path declined"
    xla = np.asarray(
        _compiled_window(plan, (0, 512, 0, 512))([src0, src1]))
    p = psnr(fused, xla)
    assert p > 55.0, f"multi masked-merge: only {p:.1f} dB"
