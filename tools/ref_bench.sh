#!/usr/bin/env bash
# The ONE reproducible command for the reference-workload flagship number
# (faker-names 5000x100000, top_n=10, l2 — /root/reference/justfile:46-52):
# runs graft.RefWorkloadBench (flagship cells, best-of-3 warm reps) and leaves
# the receipt in REF_WORKLOAD.json at the repo root. Pass `sweep` for the full
# top_n x normalization x strategy matrix (single rep per cell).
set -euo pipefail
cd "$(dirname "$0")/.."
exec tools/run_main.sh RefWorkloadBench "$@"
