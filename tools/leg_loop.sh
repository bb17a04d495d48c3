#!/bin/bash
# Dev-only: run N consecutive forked pinned BenchLeg JVMs (same shape as
# graft.Bench's forkLeg) against a fixed corpus, to measure run-to-run
# variance of a single leg. args: cores nruns [cpuset]
set -u
CORES=${1:-4}
N=${2:-5}
CPUSET=${3:-}
CP=$(cat /tmp/graft_cp.txt)
PAGES=${GRAFT_PAGES:-/dev/shm/graft-c384/pages}
DUMP=${GRAFT_DUMP:-/dev/shm/graft-c384/dump}
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
for i in $(seq 1 "$N"); do
  WORK=${GRAFT_WORKROOT:-/dev/shm}/leg-loop-$$-$i
  if [ -n "$CPUSET" ]; then CS=$CPUSET; else
    # rotate across distinct idle-ish sets like the harness would
    CS=$(python3 - "$CORES" <<'EOF'
import sys, random
n = int(sys.argv[1])
print(",".join(str(c) for c in sorted(random.sample(range(2, 32), n))))
EOF
)
  fi
  echo "=== run $i cores=$CORES cpus={$CS} ==="
  taskset -c "$CS" java -XX:ActiveProcessorCount="$CORES" -Xmx8g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    $OPENS ${EXTRA_JAVA_OPTS:-} -cp "$CP" graft.BenchLeg "$PAGES" "$DUMP" "$WORK" "$CORES" \
    2> >(grep -E "bench-leg" >&2)
  rm -rf "$WORK"
done
