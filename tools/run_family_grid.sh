#!/usr/bin/env bash
# Training-quality grid for the NON-flagship loss families (VERDICT r4 #1):
# detone-orig (supervised MSE, ref: /root/reference/train.py:316-328),
# nguyen-orig s-coco (PhotometricHead L1, ref: src/heads/PhotometricHead.py:27-61),
# zhang-orig (TripletLoss CA-UDHN, ref: src/heads/TripletHead.py:77-153).
#
# Each family runs its full reference schedule (25 epochs / 90k steps,
# batch 64) on the synthetic natural-statistics pool, stall-supervised,
# then evals at the final checkpoint. Stages skip when the run already
# reached TARGET_STEP (train.py auto-resumes from LOGGING.DIR), so the
# script is safe to re-invoke after a wedge/interruption.
#
#   tools/run_family_grid.sh [detone|nguyen|zhang]...   (default: all)
set -uo pipefail
cd "$(dirname "$0")/.."

EPOCHS="${EPOCHS:-25}"
TARGET="${TARGET:-90000}"
STALL_S="${STALL_S:-1500}"

last_step() {
  [ -f "$1/metrics.jsonl" ] || { echo 0; return; }
  tail -1 "$1/metrics.jsonl" | grep -o '"step": [0-9]*' | grep -o '[0-9]*' \
    || echo 0
}

run_family() {
  local name="$1" config="$2" logdir="$3"; shift 3
  local step
  step=$(last_step "$logdir")
  if [ "$step" -lt "$TARGET" ]; then
    echo "=== $name: training to $TARGET (at $step) ==="
    TARGET_STEP=$TARGET LOGDIR="$logdir" STALL_S=$STALL_S \
      tools/supervise_train.sh \
      python train.py --config_file "$config" --synthetic \
        --epochs "$EPOCHS" "$@" || return 1
  else
    echo "=== $name: already at step $step ==="
  fi
  echo "=== $name: eval at final checkpoint ==="
  python eval.py --config_file "$config" --synthetic --batch_size 64 \
      --ckpt "$logdir" "$@" | tee "$logdir/eval_final.txt"
}

FAMILIES=("$@")
[ ${#FAMILIES[@]} -eq 0 ] && FAMILIES=(detone nguyen zhang)
for fam in "${FAMILIES[@]}"; do
  case "$fam" in
    detone)
      run_family detone-orig config/s-coco/detone-orig-lr-5e-3.yaml \
        log/detone-orig-scoco-lr-5e-3 ;;
    nguyen)
      run_family nguyen-orig config/s-coco/nguyen-orig-lr-5e-3.yaml \
        log/nguyen-orig-scoco-lr-5e-3 ;;
    zhang)
      run_family zhang-orig config/s-coco/zhang-orig-lr-1e-2.yaml \
        log/zhang-orig-scoco-lr-1e-2 ;;
    *) echo "unknown family: $fam" >&2; exit 2 ;;
  esac
done
