"""Backend bring-up resilience.

This image's TPU plugin force-sets ``jax_platforms`` to ``axon,cpu``
at import (the JAX_PLATFORMS env var is ignored). The tunnel-backed
plugin intermittently registers its PJRT backend under the plain
``tpu`` name instead of ``axon`` - when that happens, any
``jax.devices()`` under the forced list dies with "Unable to
initialize backend 'axon'" even though the chip is reachable.

``ensure_backend()`` wraps the first device query: on that specific
failure it clears ``jax_platforms`` (auto-select) and retries, so
tools and benches survive the re-registration. Call it before the
first JAX work; it is idempotent and costs one device query.
"""

from __future__ import annotations

import os


def ensure_backend():
    """Return ``jax.devices()``, falling back to platform
    auto-selection when the image's forced platform list names a
    backend that failed to register (transient tunnel state).

    A silent fall to the CPU backend poisons whole TPU runs (the fused
    kernels then die mid-compile with 'Only interpret mode is
    supported on CPU backend'), so when the result is CPU-only this
    reports it loudly on stderr, and ENVUTIL_REQUIRE_TPU=1 turns it
    into a hard error."""
    import sys

    import jax

    if os.environ.get("ENVUTIL_PLATFORM"):
        jax.config.update("jax_platforms",
                          os.environ["ENVUTIL_PLATFORM"])
        return jax.devices()
    try:
        devs = jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        devs = jax.devices()
    if all(d.platform == "cpu" for d in devs):
        msg = ("ensure_backend: no accelerator registered - running "
               "on CPU (transient tunnel state? retry the run)")
        if os.environ.get("ENVUTIL_REQUIRE_TPU") == "1":
            raise RuntimeError(msg)
        print(msg, file=sys.stderr, flush=True)
    return devs
