#!/usr/bin/env bash
# Convergence evidence (BASELINE config #2 shape): GA-ConvNeXt-T short
# training on ImageNet-100-shaped synthetic data with the full GA recipe
# (GA/README.md:21-38 semantics: LAMB 5e-3 cosine, BCE, smoothing, mixup/
# cutmix, RandAugment, EMA, repeat-aug 3, GA_lam -0.8), scaled to one chip
# and 128px so the run fits a session. Artifacts land in
# artifacts/convergence/ (summary.csv is the logged curve).
#
# Usage: bash scripts/convergence_run.sh [epochs]
set -euo pipefail
cd "$(dirname "$0")/.."
EPOCHS="${1:-30}"
OUT=artifacts/convergence
mkdir -p "$OUT"
# 20k images / 156 steps per epoch: an 18-epoch x 5k run plateaued in
# memorization (700 steps total, eval only rising once LR decayed); this
# sizing shows a clean val-top-1 curve in ~1h on one v5e chip.
python train.py synthetic-cls:20000 \
  --model ga_convnext_tiny_688 --num-classes 100 \
  --input-size 3 128 128 -b 128 --epochs "$EPOCHS" --cooldown-epochs 3 \
  --opt lamb --lr 3e-3 --weight-decay 0.05 --sched cosine --warmup-epochs 3 \
  --bce-loss --smoothing 0.1 --mixup 0.8 --cutmix 1.0 --aa rand-m9-mstd0.5-inc1 \
  --reprob 0.25 --aug-repeats 3 --model-ema --model-ema-decay 0.999 \
  --GA_lam -0.8 --amp -j 4 --log-interval 10 \
  --output "$OUT" --experiment ga_convnext_t_in100_synth \
  2>&1 | tee "$OUT/train.log"
echo "curve:"
cat "$OUT"/*/summary.csv 2>/dev/null || true
