#!/bin/bash
# Hardware validation + benchmark checklist — run when the axon relay is up.
# Everything pending from the round-2 session where the relay died:
#   1. byte-identity gate over all kernels (incl. the new rANS pair)
#   2. butterfly-variant probe (localize the dec5970 miscompile)
#   3. headline + full benchmark matrix refresh (BENCH_DETAIL.json)
# Logs land in hw_logs/.  Each step is independently timeout-bounded.
set -u
cd "$(dirname "$0")/.."
mkdir -p hw_logs
run() {
    name=$1; shift
    echo "=== $name ==="
    timeout 1800 stdbuf -oL -eL "$@" 2>&1 | tee "hw_logs/$name.log"
    echo "=== $name exit: $? ==="
}
run verify_hw      python -u tools/verify_hw.py
run probe_butterfly python -u tools/probe_butterfly.py
run bench_quick    python bench.py --quick
run bench_main     python bench.py
run bench_deflate  python tools/bench_deflate.py
run bench_rans     python tools/bench_rans.py
run bench_e2e      python tools/bench_e2e.py
run bench_suite    python tools/bench_suite.py
echo "checklist complete; review hw_logs/ and refresh COVERAGE.md numbers"
