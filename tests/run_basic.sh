#!/usr/bin/env bash
# Basic suite: unit-ish tests (distributions, trace, state, model, dataset,
# nn, ops, parallel) — excludes remote/PPX and the statistical inference
# suites (reference counterpart: tests/run_basic.sh).
set -e
cd "$(dirname "$0")/.."
# silence XLA:CPU's cosmetic AOT-cache feature-mismatch ERROR spam (see
# util._init_compilation_cache; must be set before python starts)
export TF_CPP_MIN_LOG_LEVEL=${TF_CPP_MIN_LOG_LEVEL:-3}
# -n 2: two process-isolated workers (reference CI used -n auto,
# reference: tests/run_basic.sh:4) — isolation also contains a rare
# XLA-CPU LLVM crash seen in very long single-process runs (STATUS.md)
python -m pytest tests/ -q -n 2 -k "not remote and not inference"
