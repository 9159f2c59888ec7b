#!/usr/bin/env bash
# Mining-geometry A/B with real statistics (r12 verdict task 2): n>=3
# INTERLEAVED single-pass cold-JVM samples per geometry at sf10, each with
# its own disk stamp, so VM drift decorrelates from geometry instead of
# biasing whichever geometry ran during the slow window. Geometries:
#   4x1/2  (batch=4 ranges=2 - the current battery gate)
#   4xfull (batch=4 ranges=1)
#   oneshot (batch=0 ranges=0)
# Usage: tools/geometry_ab.sh <sf10Dir> [rounds=3]
set -u
SF=${1:?sf10 dir}
ROUNDS=${2:-3}
STAMP_FILE=/root/scratch/.ab_stamp_probe
stamp() {
  local t0 t1
  mkdir -p "$(dirname "$STAMP_FILE")"
  t0=$(date +%s.%N)
  # a failed probe (missing dir, full disk) must abort the round loudly,
  # never divide by a near-zero elapsed and record an absurd MB/s as data
  if ! dd if=/dev/zero of="$STAMP_FILE" bs=8M count=32 oflag=dsync \
      2>/tmp/ab_stamp_err; then
    echo "geometry_ab: disk stamp probe FAILED:" >&2
    cat /tmp/ab_stamp_err >&2
    exit 1
  fi
  t1=$(date +%s.%N)
  rm -f "$STAMP_FILE"
  python3 -c "print(f'{256/($t1-$t0):.1f}')"
}
cd /root/repo
for r in $(seq 1 "$ROUNDS"); do
  for g in "4 2" "4 1" "0 0"; do
    set -- $g
    echo "=== round $r geometry batch=$1 ranges=$2 disk_mb_s=$(stamp)"
    JAVA_TOOL_OPTIONS=-Djava.io.tmpdir=/root/scratch/tmp \
    SPARK_GRAFT_CPUS=32 tools/run.sh graft.tools.DriveAb "$SF" false \
      passes=1 batch="$1" ranges="$2" 2>/dev/null | grep '^AB '
  done
done
