#!/usr/bin/env bash
# Hang-tolerant driver for the long real-scale golden runs.
#
# The tunneled dev chip's remote compiler intermittently HANGS (silent, no
# exception — utils/tpu_retry.py can't catch it). golden_real_scale.py
# checkpoints every <=5000 steps and exact-resumes from the newest
# checkpoint, so the hang-tolerant protocol is: bound each attempt with
# `timeout`, and loop — every attempt either finishes or advances the
# checkpoint frontier before dying.
#
# Usage: scripts/golden_with_retries.sh [attempt_timeout_s] [attempts] -- <golden args...>
# e.g.   scripts/golden_with_retries.sh 3600 8 -- --steps 30000 --update-golden --golden-key real_scale_prop16
set -u
T=${1:-3600}; N=${2:-8}; shift 2
[ "${1:-}" = "--" ] && shift
for i in $(seq 1 "$N"); do
  echo "[golden-retries] attempt $i/$N (timeout ${T}s): $*" >&2
  timeout "$T" python "$(dirname "$0")/golden_real_scale.py" "$@"
  rc=$?
  if [ $rc -eq 0 ]; then echo "[golden-retries] done on attempt $i" >&2; exit 0; fi
  echo "[golden-retries] attempt $i exited rc=$rc; cooling down 90s" >&2
  sleep 90
done
echo "[golden-retries] exhausted $N attempts" >&2
exit 1
