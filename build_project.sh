#!/bin/bash
# Build the wheel and run the import smoke test (reference build_project.sh).
set -e
pip install -e . --no-deps --no-build-isolation
python -m pytest tests/test_build.py -q
