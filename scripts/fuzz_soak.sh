#!/usr/bin/env bash
# Differential-fuzz soak: re-run every node/brute-force parity campaign on
# fresh corpora by shifting the fuzz seeds (tests/node_oracle.fuzz_seed).
# Each offset re-generates every random corpus (~35k cases per pass across
# minimatch, WHATWG urls, JS primitives, SERP builders/parsers, template
# kernels, LLM-extract merge, robots RFC matcher). Usage:
#
#   scripts/fuzz_soak.sh [n_offsets]     # default 5
#
# Any divergence fails the pass and prints the failing triples — the same
# campaigns found 8 minimatch, 1 proxy-ordering and several URL/JS parity
# bugs in round 4, so a clean soak is evidence, not decoration.
set -u
cd "$(dirname "$0")/.."
N="${1:-5}"
FILES="tests/test_capture.py tests/test_urls.py tests/test_js_primitives_fuzz.py \
tests/test_serp_url_fuzz.py tests/test_templates_fuzz.py \
tests/test_llm_extract_fuzz.py tests/test_robots.py"
fail=0
for i in $(seq 1 "$N"); do
  off=$((i * 1000003))   # large odd stride: corpora never overlap
  echo "=== soak pass $i/$N (seed offset $off) ==="
  if ! ANYCRAWL_FUZZ_SEED_OFFSET="$off" python -m pytest $FILES -q -p no:cacheprovider -x; then
    fail=1
    echo "!!! divergence at offset $off — triples above"
    break
  fi
done
exit $fail
