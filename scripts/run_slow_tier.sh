#!/bin/sh
# Slow-tier test run: everything the default tier demotes (-m slow).
# No CI exists in this environment; run this before shipping changes to
# kernels or solver semantics (the default tier keeps a fast pin per
# path, the slow tier carries the heavier shapes/variants).
set -e
cd "$(dirname "$0")/.."
exec python -m pytest -q -m slow -n auto --dist worksteal "$@"
