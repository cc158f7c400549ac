#!/usr/bin/env bash
# S-COCO flagship training-quality demonstration (zeng-biHomE).
#
# Same shape as tools/run_pds_demo.sh but on the S-COCO protocol
# (photometric distortion OFF) with the 'grad' distilled extractor
# (multi-scale intensity+gradient pyramid — photometric invariance not
# needed on S-COCO). Stages skip when their artifact exists; stage 2
# reuses the PDS supervised warm start if present (the reference uses one
# pretrained backbone across protocols too, ref: train.py:735-742).
set -euo pipefail
cd "$(dirname "$0")/.."

MARGIN="${MARGIN:-0.02}"
EPOCHS="${EPOCHS:-5}"
# SEED != 42 gives an independent run of the same recipe (datagen/sampler
# stream only; TEST_SEED stays 42 so eval MACE is comparable across seeds).
SEED="${SEED:-42}"
# AUX / LOGDIR select an alternative frozen extractor + run directory
# (e.g. AUX=aux_cl.npz LOGDIR=log/zeng-bihome-scoco-cl for the
# contrastive-distill extractor); defaults reproduce the recorded demo.
AUX="${AUX:-aux_gradnat.npz}"
LOGDIR="${LOGDIR:-log/zeng-bihome-scoco-lr-1e-3}"
# Extractor truncation depth consumed by the head (layer2 extractors need
# MODEL.HEAD.AUXILIARY_RESNET_OUTPUT_LAYER=2; margin may need retuning —
# it must sit at ~20% of the feature-distance scale, BENCH_NOTES.md).
OUT_LAYER=1

if [ ! -f "$AUX" ]; then
  echo "=== stage 1: frozen extractor ($AUX) ==="
  case "$AUX" in
    aux_gradnat.npz)  # recorded demo: pyramid distillation only
      python tools/pretrain_aux.py --pretext grad --steps 2500 \
          --out "$AUX" ;;
    aux_cl.npz)       # + dense-correspondence InfoNCE (BENCH_NOTES)
      python tools/pretrain_aux.py --pretext gradcl --steps 2500 \
          --out "$AUX" ;;
    aux_clf.npz)      # + fine-negative (rex=0) term — best S-COCO recipe
      python tools/pretrain_aux.py --pretext gradcl --steps 2500 \
          --cl_fine_weight 0.15 --out "$AUX" ;;
    aux_clfb.npz)     # + basin-sharpening term (sub-4px misalignment slope)
      python tools/pretrain_aux.py --pretext gradcl --steps 2500 \
          --cl_fine_weight 0.15 --basin_weight 0.3 --out "$AUX" ;;
    aux_clfr.npz)     # fine-negative + rich (rank-24) distill target
      python tools/pretrain_aux.py --pretext gradcl --steps 2500 \
          --cl_fine_weight 0.15 --rich_target --out "$AUX" ;;
    aux_clfbr.npz)    # fine-negative + basin + rich target
      python tools/pretrain_aux.py --pretext gradcl --steps 2500 \
          --cl_fine_weight 0.15 --basin_weight 0.3 --rich_target \
          --out "$AUX" ;;
    aux_clfh.npz)     # fine-negative + hard-negative weighting
      python tools/pretrain_aux.py --pretext gradcl --steps 2500 \
          --cl_fine_weight 0.15 --cl_hard_beta 0.5 --out "$AUX" ;;
    aux_clfbh.npz)    # fine-negative + basin + hard-negative weighting
      python tools/pretrain_aux.py --pretext gradcl --steps 2500 \
          --cl_fine_weight 0.15 --basin_weight 0.3 --cl_hard_beta 0.5 \
          --out "$AUX" ;;
    aux_clfb_l2.npz)  # fine-negative + basin at layer2 depth (stride-8,
                      # 128-ch features; sets OUTPUT_LAYER=2 below).
                      # MEASURED WORSE than layer1 (BENCH_NOTES r3).
      python tools/pretrain_aux.py --pretext gradcl --steps 2500 \
          --cl_fine_weight 0.15 --basin_weight 0.3 --layers 2 \
          --out "$AUX" ;;
    aux_clfbh5k.npz)  # clfbh recipe on a 2x pretext schedule
      python tools/pretrain_aux.py --pretext gradcl --steps 5000 \
          --cl_fine_weight 0.15 --basin_weight 0.3 --cl_hard_beta 0.5 \
          --out "$AUX" ;;
    aux_clfbhr.npz)   # clfbh + rich (rank-24) distill target
      python tools/pretrain_aux.py --pretext gradcl --steps 2500 \
          --cl_fine_weight 0.15 --basin_weight 0.3 --cl_hard_beta 0.5 \
          --rich_target --out "$AUX" ;;
    *)
      echo "unknown AUX=$AUX — pretrain it first (tools/pretrain_aux.py)" >&2
      exit 1 ;;
  esac
fi
case "$AUX" in *_l2.npz) OUT_LAYER=2 ;; esac

if [ ! -d log/zeng-orig-pdscoco-lr-1e-3 ]; then
  echo "=== stage 2: supervised warm start (zeng-orig PDS, 3 epochs) ==="
  python train.py --config_file config/pds-coco/zeng-orig-lr-1e-3.yaml \
      --synthetic --epochs 3
fi

echo "=== stage 3: zeng-bihome S-COCO from warm start ==="
# RESUME=1 extends an existing run to a higher EPOCHS via auto-resume
# (e.g. EPOCHS=10 RESUME=1 after a 5-epoch run) instead of retraining.
if [ "${RESUME:-0}" != "1" ]; then
  rm -rf "$LOGDIR"
fi
python train.py --config_file config/s-coco/zeng-bihome-lr-1e-3.yaml \
    --synthetic --epochs "$EPOCHS" \
    --set "LOGGING.DIR=$LOGDIR" \
    --set MODEL.PRETRAINED=log/zeng-orig-pdscoco-lr-1e-3 \
    --set "MODEL.HEAD.AUXILIARY_RESNET_PATH=$AUX" \
    --set "MODEL.HEAD.AUXILIARY_RESNET_OUTPUT_LAYER=$OUT_LAYER" \
    --set MODEL.HEAD.TRIPLET_AGGREGATION=channel-aware \
    --set "MODEL.HEAD.TRIPLET_MARGIN=$MARGIN" \
    --set SOLVER.GRADIENT_CLIP=1.0 \
    --set SOLVER.LR=1e-4 \
    --set "DATA.SAMPLER.TRAIN_SEED=$SEED"
