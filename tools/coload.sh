#!/bin/bash
# Dev-only: synthetic co-tenant load for bench stress-testing (VERDICT r4
# item 7). Pins N memcpy worker loops to cpus 0..N-1 — contends both the
# cores and the shared memory fabric, the regime that corrupted the r3/r4
# driver bench runs. usage: coload.sh start [N] | coload.sh stop
set -u
PIDFILE=/tmp/graft_coload.pids
case "${1:-start}" in
  start)
    N=${2:-16}
    : > "$PIDFILE"
    for c in $(seq 0 $((N - 1))); do
      taskset -c "$c" python3 -c '
b = bytearray(64 * 1024 * 1024)
c = bytearray(64 * 1024 * 1024)
while True:
    c[:] = b' &
      echo $! >> "$PIDFILE"
    done
    echo "coload: $N memcpy workers on cpus 0-$((N - 1)) (pids in $PIDFILE)"
    ;;
  stop)
    if [ -f "$PIDFILE" ]; then
      xargs -r kill < "$PIDFILE" 2>/dev/null
      rm -f "$PIDFILE"
      echo "coload: stopped"
    fi
    ;;
esac
