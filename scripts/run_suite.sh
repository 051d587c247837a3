#!/usr/bin/env bash
# Chunked test-suite runner: one pytest process per test file.
#
# Why not a single `pytest tests/`: XLA:CPU compiles of the MSM/Groth16
# programs hold multi-GB of compiler+executable memory per process; by
# the ~20th test one process exceeds the container's 66 GB commit limit
# and LLVM aborts mid-suite (reproduced repeatedly at
# test_circom.py::test_dummy_groth16_over_bn254, which passes alone).
# Per-file processes bound the RSS and also parallelize cleanly.
#
# Usage: scripts/run_suite.sh [--smoke]
#   --smoke : fast tier only (host-math + conformance + policy tests,
#             ~15 min cold) — the pre-snapshot gate.

set -u
cd "$(dirname "$0")/.."

SMOKE_FILES=(
  tests/test_zkcp_crypto.py
  tests/test_metrics.py
  tests/test_msm_policy.py
  tests/test_wasm.py
  tests/conformance
)

if [[ "${1:-}" == "--smoke" ]]; then
  FILES=("${SMOKE_FILES[@]}")
else
  FILES=(tests/test_*.py tests/conformance)
fi

fail=0
for f in "${FILES[@]}"; do
  echo "=== $f"
  if ! timeout "${SUITE_FILE_TIMEOUT:-5400}" python -m pytest "$f" -q; then
    echo "FAILED: $f"
    fail=1
  fi
done

# bench.py tiny-shape run (CPU): the round-3 bench crashed at snapshot
# because nothing ever executed it.  This catches crashes AND (via the
# built-in host-math self-check) wrong results, in seconds.
echo "=== bench.py (tiny smoke, cpu)"
if ! timeout 900 env JAX_PLATFORMS=cpu BENCH_MSM_LOG2=10 BENCH_NTT_LOG2=10 \
    BENCH_MSM_ITERS=1 BENCH_NTT_ITERS=1 python bench.py; then
  echo "FAILED: bench.py smoke"
  fail=1
fi
exit $fail
