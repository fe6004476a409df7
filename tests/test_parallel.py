"""Device-mesh sharded rendering tests (virtual 8-device CPU mesh)."""

import math

import jax
import numpy as np
import pytest

from envutil_tpu.core.conventions import Projection
from envutil_tpu.core.facet import Facet
from envutil_tpu.core.metrics import get_extent, get_step
from envutil_tpu.models import environment as E
from envutil_tpu.parallel.mesh import (make_mesh, replicate_sources,
                                       sharded_render)
from envutil_tpu.runtime.args import Args
from envutil_tpu.runtime.render import build_plan, render_frame

RNG = np.random.default_rng(9)


def _make(projection, w, h, hfov):
    f = Facet(facet_no=0, nchannels=3)
    f.set_geometry(projection, w, h, hfov)
    f.step = get_step(projection, w, h, hfov)
    f.process_geometry()
    return f


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_render_matches_single_device():
    img = RNG.uniform(0, 1, (64, 128, 3)).astype(np.float32)
    fct = _make(Projection.SPHERICAL, 128, 64, 2 * math.pi)
    src = E.make_mount_source(fct, img, 1, 1)

    args = Args()
    args.projection = Projection.RECTILINEAR
    args.width, args.height = 64, 64
    args.hfov = math.radians(80)
    args.extent = get_extent(args.projection, 64, 64, args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / 64
    args.yaw = math.radians(30)
    args.spline_degree = args.prefilter_degree = 1
    args.twine = 0
    args.synopsis = "panorama"
    args.nchannels = 3
    args.facets = [fct]
    args.solo = 0
    plan = build_plan(args, [fct])

    single = render_frame(plan, [src])

    mesh = make_mesh(jax.devices()[:8])
    srcs = replicate_sources([src], mesh)
    fn = sharded_render(plan, srcs, mesh)
    out = jax.block_until_ready(fn(srcs))
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), single, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_render_frame_mesh_option():
    """render_frame(mesh_n=N) - the --mesh CLI path - matches the
    single-device frame and falls back cleanly when it can't shard."""
    img = RNG.uniform(0, 1, (64, 128, 3)).astype(np.float32)
    fct = _make(Projection.SPHERICAL, 128, 64, 2 * math.pi)
    src = E.make_mount_source(fct, img, 1, 1)

    args = Args()
    args.projection = Projection.RECTILINEAR
    args.width, args.height = 64, 64
    args.hfov = math.radians(80)
    args.extent = get_extent(args.projection, 64, 64, args.hfov)
    args.step = (args.extent.x1 - args.extent.x0) / 64
    args.yaw = math.radians(-20)
    args.spline_degree = args.prefilter_degree = 1
    args.twine = 0
    args.synopsis = "panorama"
    args.nchannels = 3
    args.facets = [fct]
    args.solo = 0
    plan = build_plan(args, [fct])

    single = render_frame(plan, [src])
    meshed = render_frame(plan, [src], mesh_n=8)
    np.testing.assert_allclose(meshed, single, atol=1e-6)

    # 64 rows don't divide over 7 devices: must fall back, not crash
    fallback = render_frame(plan, [src], mesh_n=7)
    np.testing.assert_allclose(fallback, single, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("degree", [1, 3])
def test_ring_spline_eval_exact(degree):
    """Facet-sharded evaluation: coefficient row bands ring-rotated
    over the mesh (ppermute) reproduce eval_spline exactly."""
    import jax.numpy as jnp
    from envutil_tpu.ops import spline as S
    from envutil_tpu.parallel.mesh import (ring_spline_eval,
                                           shard_spline_rows)

    img = jnp.asarray(RNG.uniform(0, 1, (94, 130, 3)), np.float32)
    spl = S.make_spline(img, degree, bcs=(S.MIRROR, S.PERIODIC))
    H, W = 64, 128
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    # coords wander over the whole table, including out-of-range
    # values for the gates
    x = jnp.asarray((-20 + 1.3 * jj + 9 * np.sin(ii / 9))
                    .astype(np.float32))
    y = jnp.asarray((-5 + 1.6 * ii + 7 * np.cos(jj / 13))
                    .astype(np.float32))
    ref = S.eval_spline(spl, x, y)

    mesh = make_mesh(jax.devices()[:8])
    sharded = shard_spline_rows(spl, mesh)
    out = ring_spline_eval(sharded, x, y, mesh)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)
