#!/usr/bin/env bash
# Statistical end-to-end inference suites (reference: tests/run_inference.sh).
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/test_inference.py -q
