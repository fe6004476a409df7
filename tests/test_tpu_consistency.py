"""Fused-Pallas vs exact-XLA consistency on real TPU hardware.

The CPU suite exercises the kernels in interpreter mode; this test runs
tools/check_tpu.py (solo fused frame, per-tap twined multi-facet, and
cubemap/biatan6 section variants, each compared against the exact XLA
graph at >55-60 dB) on the actual TPU backend.

The whole pytest process is pinned to the CPU platform by conftest.py,
and two JAX processes must never share the axon TPU tunnel, so the
check runs in a subprocess and is opt-in: set ENVUTIL_TPU_CHECK=1 when
a TPU is attached and idle. CI keeps it skipped; run it before
committing kernel changes.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.skipif(os.environ.get("ENVUTIL_TPU_CHECK") != "1",
                    reason="TPU consistency check is opt-in: set "
                           "ENVUTIL_TPU_CHECK=1 with a TPU attached")
def test_fused_kernels_match_xla_on_tpu():
    env = dict(os.environ)
    # let the axon plugin pick the TPU; drop any CPU pinning
    env.pop("JAX_PLATFORMS", None)
    env.pop("ENVUTIL_PLATFORM", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_tpu.py")],
        cwd=str(REPO), env=env, capture_output=True, text=True,
        timeout=1800)
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    assert proc.returncode == 0, "fused kernels diverge from XLA on TPU"
