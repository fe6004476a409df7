"""Test harness configuration.

Tests run on CPU with a virtual 8-device mesh so that multi-chip
sharding code paths compile and execute without TPU hardware, and with
x64 enabled so geometry property tests can assert at float64 precision
(the reference's geometry.cc tests assert at 1e-13).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# In this image a plugin force-sets jax_platforms to "axon,cpu" at
# import, overriding the JAX_PLATFORMS env var - every "CPU" test
# would silently run over the TPU tunnel. Set the config directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Persist the run summary (TESTS_LAST.json at the repo root) so
    test-count claims are checkable artifacts like the bench numbers
    (round-3 advisor finding). Records the invocation args too, so a
    partial selection is distinguishable from the full suite."""
    import json
    import time

    stats = {k: len(v) for k, v in terminalreporter.stats.items() if k}
    out = {
        "when": time.strftime("%Y-%m-%d %H:%M:%S"),
        "exitstatus": int(exitstatus),
        "args": [str(a) for a in config.invocation_params.args],
        "counts": stats,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "TESTS_LAST.json")
    try:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    except OSError:
        pass
