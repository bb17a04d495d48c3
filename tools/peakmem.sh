#!/bin/bash
# Dev-only: sample the memory footprint of a running bench (VERDICT r4
# item 8) — per-java-process RSS, their sum, and /dev/shm usage — every
# 2 s until killed; prints running peaks on exit.
# usage: peakmem.sh [outfile]
set -u
OUT=${1:-/tmp/graft_peakmem.log}
peak_sum=0; peak_one=0; peak_shm=0
trap 'echo "PEAK java-RSS sum=${peak_sum}MB single=${peak_one}MB shm=${peak_shm}MB" | tee -a "$OUT"; exit 0' INT TERM
: > "$OUT"
while :; do
  sum=0; one=0
  for p in $(pgrep -x java); do
    # END{...} so a status file WITHOUT a VmRSS line (zombie/exiting pid)
    # still yields 0 instead of an empty string that breaks the arithmetic
    rss=$(awk '/VmRSS/{r=int($2/1024)} END{print r+0}' "/proc/$p/status" 2>/dev/null || echo 0)
    sum=$((sum + rss))
    [ "$rss" -gt "$one" ] && one=$rss
  done
  shm=$(df -m /dev/shm | awk 'NR==2{print $3}')
  [ "$sum" -gt "$peak_sum" ] && peak_sum=$sum
  [ "$one" -gt "$peak_one" ] && peak_one=$one
  [ "$shm" -gt "$peak_shm" ] && peak_shm=$shm
  echo "$(date +%H:%M:%S) java_sum=${sum}MB java_max=${one}MB shm=${shm}MB" >> "$OUT"
  sleep 2
done
