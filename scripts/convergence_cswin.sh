#!/usr/bin/env bash
# Convergence evidence for the transformer family (BASELINE driver config #3
# shape): GA-CSWin-T short training on ImageNet-100-shaped synthetic-cls data
# with the full GA recipe (GA/README.md:57-63 semantics: LAMB cosine, BCE,
# smoothing, mixup/cutmix, RandAugment, EMA, repeat-aug, GA_lam -0.8).
# 224px (the CSWin stripe geometry is built for 224: split_size [1,2,7,7,7]
# needs the 56/28/14/7 stage grids), one chip, batch 64.
#
# LR 1.25e-4 is the recipe-faithful linear scaling of GA/README.md:63
# (lr 2e-3 at global batch 2x128x4accum=1024 -> x64/1024 for one-chip b=64) —
# see scripts/convergence_run.sh for why over-scaled LRs collapse.
#
# Usage: bash scripts/convergence_cswin.sh [epochs]
set -euo pipefail
cd "$(dirname "$0")/.."
EPOCHS="${1:-12}"
OUT=artifacts/convergence
mkdir -p "$OUT"
python train.py synthetic-cls:10000:2500 \
  --model ga_cswin_tiny --num-classes 100 \
  --input-size 3 224 224 -b 64 --epochs "$EPOCHS" --cooldown-epochs 2 \
  --opt lamb --lr 1.25e-4 --weight-decay 0.05 --sched cosine --warmup-epochs 3 \
  --warmup-lr 1e-6 --bce-loss --smoothing 0.1 --mixup 0.8 --cutmix 1.0 \
  --aa rand-m9-mstd0.5-inc1 --reprob 0.25 --aug-repeats 3 \
  --drop-path 0.2 --model-ema --model-ema-decay 0.999 \
  --GA_lam -0.8 --amp -j 4 --log-interval 20 \
  --output "$OUT" --experiment ga_cswin_t_in100_synth \
  2>&1 | tee "$OUT/train_cswin.log"
echo "curve:"
cat "$OUT"/ga_cswin_t_in100_synth/summary.csv 2>/dev/null || true
