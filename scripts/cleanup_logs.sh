#!/usr/bin/env bash
# Delete logs/* except logs/example (counterpart of the reference's
# scripts/cleanup_logs.sh).
set -euo pipefail
cd "$(dirname "$0")"
shopt -s nullglob
for d in logs/*; do
  if [[ "$(basename "$d")" != "example" ]]; then
    rm -rf "$d"
    echo "removed $d"
  fi
done
