#!/bin/bash
# RESULTS.md must be artifact-true (VERDICT r4 "what's weak" #3 / ask #8):
# every `results/...` or `output/...` path cited in RESULTS.md must exist in
# the tree, except paths in lines explicitly marked "not landed".
# Exit 1 and list offenders otherwise.  Run at end-of-round before commit.
set -u
cd "$(dirname "$0")/.."
fail=0
while IFS= read -r line; do
  case "$line" in *"not landed"*|*"NOT LANDED"*) continue;; esac
  for p in $(echo "$line" | grep -oE '(results|output|artifacts)/[A-Za-z0-9_./-]+' ); do
    if [ ! -e "$p" ]; then
      echo "MISSING: $p  (cited in RESULTS.md: ${line:0:90})"
      fail=1
    fi
  done
done < RESULTS.md
[ $fail -eq 0 ] && echo "RESULTS.md artifact check: OK"
exit $fail
