#!/bin/bash
# Dev-only: A/B/A pinned-leg comparison between the working tree (NEW)
# and HEAD~0 stash (OLD), alternating runs so host drift cannot masquerade
# as a code effect. args: cores pattern(e.g. NEW,OLD,NEW)
set -u
CORES=${1:-4}
PATTERN=${2:-NEW,OLD,NEW}
cd /root/repo
IFS=',' read -ra RUNS <<< "$PATTERN"
for tag in "${RUNS[@]}"; do
  if [ "$tag" = "OLD" ]; then git stash -q; else git stash list | grep -q . && git stash pop -q; fi
  sbt -batch "Compile / compile" > /dev/null 2>&1
  echo "=== $tag cores=$CORES $(date +%H:%M:%S) ==="
  bash tools/leg_loop.sh "$CORES" 1 2>&1 | grep -E "cores|bench-leg. main"
done
git stash list | grep -q . && git stash pop -q
echo ABA_COMPLETE
