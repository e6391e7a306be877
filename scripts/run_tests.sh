#!/bin/bash
# Test runner (reference: scripts/run_tests.sh:1-7). Tests run on a virtual
# 8-device CPU mesh (tests/conftest.py); pass a --work_dir to keep artifacts.

WORK_DIR="${WORK_DIR:-test_dir/}"

cd "$(dirname "${BASH_SOURCE[0]}")/.."
mkdir -p "${WORK_DIR}"
python3 -m pytest -p no:cacheprovider -q tests --work_dir "${WORK_DIR}" "$@"
