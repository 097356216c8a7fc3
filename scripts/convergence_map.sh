#!/usr/bin/env bash
# Convergence evidence for the MAP engine path (self-distillation pairs +
# decorrelation loss): MAP-ConvNeXt-T short training on ImageNet-100-shaped
# synthetic data with the MAP convnext_tiny recipe (train_with_script.py
# setting_dict row, reference MAP/train_with_script.py:15), scaled to one
# chip and 128px so the run fits a session. Unlike the GA runs
# (scripts/convergence_run.sh), this exercises multi_group_loss's
# (org, avg) KL(avg || org.detach()) self-distill terms and dec_lam -0.8
# decorrelation across the 4 MAP groups (MAP/train.py:792-839 semantics).
#
# Dataset: synthetic-cls with EPOCH-VARYING train noise (data/dataset.py) —
# memorization-proof, see convergence_run.sh header.
#
# LR: 6.25e-4 = recipe-faithful linear scaling of lr 5e-3 at total batch
# 1024 (-tb 1024) down to one-chip b=128 (x128/1024).
#
# Usage: bash scripts/convergence_map.sh [epochs]
set -euo pipefail
cd "$(dirname "$0")/.."
EPOCHS="${1:-15}"
OUT=artifacts/convergence
mkdir -p "$OUT"
python train.py synthetic-cls:20000:5000 \
  --model map_convnext_tiny --num-classes 100 \
  --input-size 3 128 128 -b 128 --epochs "$EPOCHS" --cooldown-epochs 3 \
  --opt lamb --opt-eps 1e-8 --momentum 0.8 --lr 6.25e-4 --weight-decay 0.05 \
  --sched cosine --warmup-epochs 3 --warmup-lr 1e-6 \
  --bce-loss --smoothing 0.1 --mixup 0.8 --cutmix 1.0 \
  --aa rand-m9-mstd0.5-inc1 --reprob 0.25 --remode pixel --aug-repeats 3 \
  --drop-path 0.1 --model-ema --model-ema-decay 0.999 \
  --dec-lam -0.8 --amp -j 4 --log-interval 10 \
  --output "$OUT" --experiment map_convnext_t_in100_synth \
  2>&1 | tee "$OUT/train_map.log"
echo "curve:"
cat "$OUT"/map_convnext_t_in100_synth*/summary.csv 2>/dev/null || true
