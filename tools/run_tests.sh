#!/usr/bin/env bash
# CI runner. Two tiers:
#
#   tools/run_tests.sh quick   # pre-commit gate: every unit/parity test,
#                              # excludes the @pytest.mark.slow integration
#                              # tier (multi-process clusters, 8-device
#                              # end-to-end programs, 250s patch-match
#                              # sharded runs); ~4-6 min on 2 CPUs
#   tools/run_tests.sh full    # everything, parallelized with pytest-xdist
#                              # across the available cores; ~12-15 min on
#                              # 2 CPUs (vs ~20 min serial)
#
# The quick tier is the gate to run after EVERY commit-sized change; run
# the full tier before ending a work session or after touching the
# sharded/distributed layers. Both tiers share the persistent JAX
# compilation cache (.jax_cache), so repeat runs are much faster than
# cold ones.
set -euo pipefail
cd "$(dirname "$0")/.."

tier="${1:-quick}"
shift || true
case "$tier" in
  quick)
    exec python -m pytest tests/ -m "not slow" -q "$@"
    ;;
  full)
    n="$(nproc)"
    exec python -m pytest tests/ -q -n "$n" "$@"
    ;;
  *)
    echo "usage: $0 [quick|full] [pytest args...]" >&2
    exit 2
    ;;
esac
