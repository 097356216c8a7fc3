#!/usr/bin/env bash
# Convergence evidence (BASELINE config #2 shape): GA-ConvNeXt-T short
# training on ImageNet-100-shaped synthetic data with the full GA recipe
# (GA/README.md:26 semantics: LAMB cosine, BCE, smoothing, mixup/cutmix,
# RandAugment, EMA, repeat-aug 3, GA_lam -0.8, drop-path .2), scaled to one
# chip and 128px so the run fits a session. Artifacts land in
# artifacts/convergence/ (summary.csv is the logged curve).
#
# Dataset: synthetic-cls with EPOCH-VARYING train noise (data/dataset.py) —
# each epoch re-draws every sample's noise around the fixed class template,
# so train loss cannot fall by memorizing pixels; an earlier fixed-noise run
# (train.log.memorization in git history) collapsed to chance-val
# memorization by epoch ~4.
#
# LR: 6.25e-4 is the *recipe-faithful* linear scaling of GA/README.md:26
# (lr 5e-3 at global batch 2x128x4accum=1024 -> x128/1024 for one-chip
# b=128). Two earlier runs at 3e-3 and 2e-3 (log suffixes .memorization /
# .lr2e-3) both collapsed right as the schedule crossed ~1.5e-3: raw val
# peaked >50% during warmup (while LR was near the faithful value), then the
# model fell into the degenerate all-negative-logit BCE basin (per-head BCE
# ~0.2 with near-constant logits, scripts/diag_heads.py) and val went to
# chance while train loss dove. At the faithful LR the peak never enters the
# unstable region.
#
# Usage: bash scripts/convergence_run.sh [epochs]
set -euo pipefail
cd "$(dirname "$0")/.."
EPOCHS="${1:-15}"
OUT=artifacts/convergence
mkdir -p "$OUT"
python train.py synthetic-cls:20000:5000 \
  --model ga_convnext_tiny_688 --num-classes 100 \
  --input-size 3 128 128 -b 128 --epochs "$EPOCHS" --cooldown-epochs 3 \
  --opt lamb --lr 6.25e-4 --weight-decay 0.05 --sched cosine --warmup-epochs 3 \
  --warmup-lr 1e-6 --bce-loss --smoothing 0.1 --mixup 0.8 --cutmix 1.0 \
  --aa rand-m9-mstd0.5-inc1 --reprob 0.25 --aug-repeats 3 \
  --drop-path 0.2 --model-ema --model-ema-decay 0.999 \
  --GA_lam -0.8 --amp -j 4 --log-interval 10 \
  --output "$OUT" --experiment ga_convnext_t_in100_synth \
  2>&1 | tee "$OUT/train.log"
echo "curve:"
cat "$OUT"/*/summary.csv 2>/dev/null || true
