#!/usr/bin/env bash
# Predict-time knob sweep on the PDS-COCO flagship checkpoint
# (VERDICT r3 item 5: bounded PDS-specific quality attempt).
#
# Sweeps the predict-only DSAC refine knobs over the trained 90k
# checkpoint — no retraining; every variant is one eval.py run over the
# full 2304-sample protocol. Results append to $OUT as "label<TAB>mace".
#
#   CKPT=log/zeng-bihome-pdscoco-clfbh AUX=aux_pdsclfbh.npz \
#     tools/sweep_pds_predict.sh
set -uo pipefail
cd "$(dirname "$0")/.."

CKPT="${CKPT:-log/zeng-bihome-pdscoco-clfbh}"
AUX="${AUX:-aux_pdsclfbh.npz}"
CFG="${CFG:-config/pds-coco/zeng-bihome-lr-1e-3.yaml}"
OUT="${OUT:-/tmp/sweep_pds_predict.tsv}"

run() {
  local label="$1"; shift
  echo "=== $label ==="
  local mace
  # 900s cap: a full-protocol eval takes ~5-6 min incl. compile; the axon
  # tunnel can wedge mid-run (<2% host CPU, no error — see BENCH_NOTES r4),
  # and a wedged variant should fail fast and let the next one proceed.
  mace=$(timeout 900 python eval.py --config_file "$CFG" --synthetic \
      --batch_size 64 --ckpt "$CKPT" --skip_timing \
      --set "MODEL.HEAD.AUXILIARY_RESNET_PATH=$AUX" \
      --set MODEL.HEAD.TRIPLET_AGGREGATION=channel-aware \
      --set MODEL.HEAD.TRIPLET_MARGIN=0.02 \
      "$@" 2>&1 | grep '^Mean mace' | awk '{print $3}')
  echo -e "$label\t${mace:-FAILED}" | tee -a "$OUT"
}

R='--set MODEL.HEAD.DSAC_PREDICT_REFINE=true'
B='--set MODEL.HEAD.DSAC_PREDICT_BIDIRECTIONAL=true'

run base
run refine $R
run refine+bidir $R $B
for thr in 1.5 2.0 4.0; do
  run "refine+bidir thr=$thr" $R $B \
      --set "MODEL.HEAD.DSAC_PREDICT_REFINE_THRESHOLD=$thr"
done
# NB: DSAC_PREDICT_REFINE_ITERS=2 deterministically faults the axon
# backend on the full eval graph (BENCH_NOTES r4); iters>1 is value-pinned
# on CPU in tests/test_heads.py instead.
echo "sweep written to $OUT"
