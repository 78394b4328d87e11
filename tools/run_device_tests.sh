#!/bin/sh
# Run the device-scoped test files against the REAL accelerator backend and
# record the result as a driver-visible artifact (TESTS_TPU_r<N>.txt at the
# repo root). VERDICT r02 item 8: the repo must pin a per-round chip run of
# the device suite rather than relying on the judge to reproduce it.
#
# Usage: sh tools/run_device_tests.sh <round>   (e.g. 03)
set -u
ROUND="${1:?usage: run_device_tests.sh <round, e.g. 03>}"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
OUT="$ROOT/TESTS_TPU_r$ROUND.txt"
{
  echo "# Device test suite on the real accelerator backend"
  echo "# date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  python -c "import jax; print('# devices:', jax.devices())" 2>/dev/null \
    | grep -v WARNING
  cd "$ROOT" && CAVIF_TPU_TEST_DEVICE=1 JAX_PLATFORMS=axon \
    timeout 3000 python -m pytest \
      tests/test_device_itx.py tests/test_device_pass2.py \
      tests/test_device_predict.py tests/test_device_search.py \
      tests/test_pallas_search.py tests/test_block_search.py \
      tests/test_delta_q.py tests/test_sharded_device.py \
      tests/test_device_filters.py tests/test_attachment.py \
      tests/test_pass1_pallas.py tests/test_eob_adapt.py \
      -q 2>&1 | grep -v "WARNING"
} > "$OUT" 2>&1
tail -2 "$OUT"
