#!/usr/bin/env bash
# Occupancy-refresh cadence A/B (VERDICT r2 #7): PSNR at fixed steps on the
# real-scale golden scene, sample_fraction 1/32 (our default) vs 1/4
# (nerfacc-parity cadence). Serializes the two runs on the one dev chip.
#
# Usage: bash scripts/occ_cadence_ab.sh [steps]
set -e
STEPS=${1:-8000}
cd "$(dirname "$0")/.."

for frac in 0.03125 0.25; do
  wd="outputs/occ_ab_${frac}"
  mkdir -p "$wd" outputs/golden_real/scene
  # reuse the golden scene instead of regenerating 134 MB (the first arm
  # writes it through the symlink if it isn't already on disk)
  [ -e "$wd/scene" ] || ln -s "$(pwd)/outputs/golden_real/scene" "$wd/scene"
  echo "=== occ cadence arm sample_fraction=$frac ($STEPS steps) ==="
  python -u scripts/golden_real_scale.py \
    --workdir "$wd" --steps "$STEPS" --no-golden --skip-eval-protocol \
    --pipeline.model.occ-sample-fraction="$frac"
done
echo "=== results ==="
for frac in 0.03125 0.25; do
  f=$(find "outputs/occ_ab_${frac}" -name eval_mean.json | head -1)
  echo "sample_fraction=$frac: $(cat "$f" 2>/dev/null || echo MISSING)"
done
