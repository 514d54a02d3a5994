#!/bin/sh
# Tail-coverage tripwire (judge r6 next-round #2): value-verify every
# queries() entry OUTSIDE the driver's 50-entry correctness window against
# its DuckDB oracle at sf0.001, and fail loudly on any mismatch — so
# out-of-window queries keep ENFORCED regression coverage between window
# rotations instead of narrative-only ORACLE_r0N artifacts.
#
# Run from the repo root. Intended as the CI / pre-commit gate for any
# change that touches __spark_entry__.py or cdc_connector_spark/; a green
# run writes TAILCHECK.json (committed per round as the run log).
#
#   sh tools/tail_tripwire.sh            # default sf0.001, ~3-5 min
#   sh tools/tail_tripwire.sh /root/testdata/sf0.01
#
# Optional hook install:  git config core.hooksPath .githooks
set -e
SF_DIR="${1:-/root/testdata/sf0.001}"
exec python tools/check_oracle.py --json TAILCHECK.json --tail "$SF_DIR"
