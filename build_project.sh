#!/bin/bash
# Build the wheel and run the import smoke test (reference build_project.sh).
# For the full suite use scripts/run_tests.py (per-file process isolation —
# a single pytest process accumulates XLA:CPU compiler state until it
# segfaults around test ~110; see that script's docstring).
set -e
pip install -e . --no-deps --no-build-isolation
python -m pytest tests/test_build.py -q
