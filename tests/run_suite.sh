#!/usr/bin/env bash
# Canonical full-suite invocation (docs/developer_guide/testing.md):
#
#   bash tests/run_suite.sh
#
# Runs the complete suite with two worker processes (pytest-xdist,
# file-granular distribution). The split is load-bearing, not a speed
# optimization: a single process that compiles the suite's ~600 XLA:CPU
# programs crashes inside the XLA compiler with the persistent
# compilation cache on OR off (three distinct crash sites recorded in
# testing.md); two workers stay under the threshold and the suite
# completes. Every test also passes in isolation.
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests -q -n 2 --dist loadfile "$@"
