#!/usr/bin/env bash
# Basic suite: unit-ish tests (distributions, trace, state, model, dataset,
# nn, ops, parallel) — excludes remote/PPX and the statistical inference
# suites (reference counterpart: tests/run_basic.sh).
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q -x -k "not remote and not inference"
