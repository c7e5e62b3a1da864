#!/usr/bin/env bash
# Full suite incl. remote/PPX tests against locally built C++ simulators
# (reference pulls a docker image instead: tests/run_all.sh).
set -e
cd "$(dirname "$0")/.."
make -C cpp -j4
python -m pytest tests/ -q
