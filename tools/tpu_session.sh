#!/bin/bash
# Full TPU validation + benchmark sequence, run serially (NEVER run two
# JAX processes against the axon tunnel at once). Usage:
#   bash tools/tpu_session.sh [outdir]
# Probes the tunnel first; exits 2 if it is down.
set -u
OUT=${1:-/tmp/tpu_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
# NEVER export PYTHONPATH here: the presence of the PYTHONPATH env var
# (any value, even an empty dir) makes the axon TPU plugin register
# under 'tpu' with a failing libtpu init instead of 'axon' - every JAX
# process then silently lands on CPU. Install the package instead.
pip install -e . --no-deps --no-build-isolation -q

code=$(curl -s -m 5 -o /dev/null -w "%{http_code}" http://127.0.0.1:8093 || true)
if [ "$code" = "000" ]; then
    # the relay may not answer plain HTTP; fall back to a 60s device probe
    if ! timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        echo "tunnel down (probe $code); aborting" | tee "$OUT/status"
        exit 2
    fi
fi
echo "tunnel up" | tee "$OUT/status"

run() {
    name=$1; shift
    echo "=== $name: $* ===" | tee -a "$OUT/status"
    timeout 5400 "$@" > "$OUT/$name.log" 2>&1
    echo "$name rc=$?" | tee -a "$OUT/status"
}

# 1. correctness: fused kernels vs XLA on the real chip
run check_tpu python tools/check_tpu.py
# 2. headline bench
run bench python bench.py
# 3. sweep: twined configs first (the union-tap validation targets),
#    then stitches incl. the new champion-stable twined stitch (5d)
run sweep_twine python benchmarks.py 4b 4c 4
run sweep_stitch python benchmarks.py 5 5b 5d 5c
run sweep_rest python benchmarks.py 1 3 2r 3b
# 4. finish-mode probe (canvas zeros / transpose cost on the headline)
run probe_finish python tools/probe_finish.py

tail -n 3 "$OUT"/*.log
