#!/usr/bin/env bash
# Same-seed fast-vs-exact GELU convergence A/B (VERDICT r4 missing #2).
#
# Round 3/4 made the single-segment minimax GELU fit (nn/layers.py gelu_fast,
# ops/convnext_block.py "fast") the TRAINING default in every family, worth
# +3..15%/family on the train step; the reference trains with exact-erf GELU
# (torch.nn.GELU via timm Mlp, /root/reference/GA/ga_convnext.py:98-112).
# The deviation was argued from error bounds (~1e-4-3e-5, ~20x below bf16
# output quantization) but never demonstrated. This runs the SAME recipe as
# scripts/convergence_map.sh (MAP-ConvNeXt-T, synthetic IN-100 with
# epoch-varying noise, recipe-faithful scaled LR) twice with identical seed
# and flags, differing ONLY in the GELU implementation:
#   arm "fast":  training default (gelu_fast in XLA sites + "fast" in the
#                Pallas LN+MLP kernel)
#   arm "exact": IMTPU_GELU=exact IMTPU_XLA_GELU=exact (reference numerics)
# Curves land in artifacts/convergence/gelu_ab_{fast,exact}/summary.csv.
#
# Usage: bash scripts/convergence_gelu_ab.sh [epochs]
set -euo pipefail
cd "$(dirname "$0")/.."
# The host-side aug pipeline (1 CPU core) bounds wall clock at ~25 min/epoch
# for 20000 imgs; the A/B's validity needs identical arms, not a big corpus,
# so the default comparison runs 10000:2500 x 6 epochs (~2.5 h both arms).
EPOCHS="${1:-6}"
NTRAIN="${2:-10000}"
NVAL="${3:-2500}"
OUT=artifacts/convergence
mkdir -p "$OUT"

run_arm() {
  local arm="$1"; shift
  env "$@" python train.py "synthetic-cls:$NTRAIN:$NVAL" \
    --model map_convnext_tiny --num-classes 100 \
    --input-size 3 128 128 -b 128 --epochs "$EPOCHS" --cooldown-epochs 0 \
    --opt lamb --opt-eps 1e-8 --momentum 0.8 --lr 6.25e-4 --weight-decay 0.05 \
    --sched cosine --warmup-epochs 3 --warmup-lr 1e-6 \
    --bce-loss --smoothing 0.1 --mixup 0.8 --cutmix 1.0 \
    --aa rand-m9-mstd0.5-inc1 --reprob 0.25 --remode pixel --aug-repeats 3 \
    --drop-path 0.1 --model-ema --model-ema-decay 0.999 \
    --dec-lam -0.8 --amp -j 4 --log-interval 20 --seed 42 \
    --output "$OUT" --experiment "gelu_ab_$arm" \
    2>&1 | tee "$OUT/gelu_ab_$arm.log"
}

run_arm fast
run_arm exact IMTPU_GELU=exact IMTPU_XLA_GELU=exact

echo "== fast =="; cat "$OUT"/gelu_ab_fast/summary.csv
echo "== exact =="; cat "$OUT"/gelu_ab_exact/summary.csv
