#!/bin/bash
# Hang-tolerant wrapper for one-shot chip probes (same rationale as
# golden_with_retries.sh: the tunneled compiler intermittently hangs with
# zero CPU accrual; bound each attempt and loop).
# Usage: probe_with_retries.sh <timeout_s> <attempts> <cmd...>
set -u
T=$1; N=$2; shift 2
for i in $(seq 1 "$N"); do
  echo "[probe-retry] attempt $i/$N (timeout ${T}s): $*" >&2
  timeout "$T" "$@"
  rc=$?
  [ $rc -eq 0 ] && exit 0
  echo "[probe-retry] attempt $i rc=$rc; cooldown 120s" >&2
  sleep 120
done
echo "[probe-retry] exhausted $N attempts" >&2
exit 1
