#!/usr/bin/env bash
# Convergence evidence (BASELINE config #2 shape): GA-ConvNeXt-T short
# training on ImageNet-100-shaped synthetic data with the full GA recipe
# (GA/README.md:21-38 semantics: LAMB cosine, BCE, smoothing, mixup/
# cutmix, RandAugment, EMA, repeat-aug 3, GA_lam -0.8), scaled to one chip
# and 128px so the run fits a session. Artifacts land in
# artifacts/convergence/ (summary.csv is the logged curve).
#
# Dataset: synthetic-cls with EPOCH-VARYING train noise (data/dataset.py) —
# each epoch re-draws every sample's noise around the fixed class template,
# so train loss cannot fall by memorizing pixels; earlier fixed-noise runs
# (train.log.memorization in git history) collapsed to chance-val
# memorization by epoch ~4. Peak LR 2e-3: the 3e-3 recipe value (tuned for
# ImageNet-scale data) destabilized the small synthetic task at warmup peak
# (epoch-1 raw val 52.8% -> epoch-3 1.8%).
#
# Usage: bash scripts/convergence_run.sh [epochs]
set -euo pipefail
cd "$(dirname "$0")/.."
EPOCHS="${1:-12}"
OUT=artifacts/convergence
mkdir -p "$OUT"
python train.py synthetic-cls:20000:5000 \
  --model ga_convnext_tiny_688 --num-classes 100 \
  --input-size 3 128 128 -b 128 --epochs "$EPOCHS" --cooldown-epochs 3 \
  --opt lamb --lr 2e-3 --weight-decay 0.05 --sched cosine --warmup-epochs 3 \
  --bce-loss --smoothing 0.1 --mixup 0.8 --cutmix 1.0 --aa rand-m9-mstd0.5-inc1 \
  --reprob 0.25 --aug-repeats 3 --model-ema --model-ema-decay 0.999 \
  --GA_lam -0.8 --amp -j 4 --log-interval 10 \
  --output "$OUT" --experiment ga_convnext_t_in100_synth \
  2>&1 | tee "$OUT/train.log"
echo "curve:"
cat "$OUT"/*/summary.csv 2>/dev/null || true
