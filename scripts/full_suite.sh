#!/bin/sh
# The COMPLETE test sweep — the default `pytest tests/` excludes
# @pytest.mark.slow (pytest.ini) so it finishes inside the driver's
# verify window; this script runs everything: the default set, the slow
# replay/property/parity sweeps, and the full FULLSTACK script replay
# (FULLSTACK_ALL=1 switches test_fullstack_scripts from its smoke subset
# to all 264 reference scripts). Expect ~1-1.5 h.
set -e
cd "$(dirname "$0")/.."
FULLSTACK_ALL=1 python -m pytest tests/ -q -m "slow or not slow" "$@"
