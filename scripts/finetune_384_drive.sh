#!/usr/bin/env bash
# BASELINE driver config #5 shape: GA-CSWin-B 384 fine-tune from a 224
# checkpoint (GA/README.md fine-tune recipe), driven end-to-end through the
# real CLIs on tiny step counts:
#   1. export a ga_cswin_base (224) .pth.tar (the released-weights stand-in;
#      no egress, so random-init weights play the role of the 224 ckpt)
#   2. train.py --model ga_cswin_base_384 --finetuning-checkpoint <that>
#      (ckpt/finetune.py surgery: fc kept — same class count — pos-free
#      CSWin transfers cleanly across resolutions)
# DP note: the mesh covers all visible devices; on the 1-chip bench host this
# runs single-chip, the multi-device sharding path itself is exercised by
# tests/test_multihost.py and __graft_entry__.dryrun_multichip.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/ft384}
mkdir -p "$OUT"

python - <<'EOF'
import os, jax
from imagenet_models_tpu.core.setup import setup_jax, jit_init
setup_jax(platform=os.environ.get("IMTPU_PLATFORM", ""))
import jax.numpy as jnp
import imagenet_models_tpu.models  # noqa: F401
from imagenet_models_tpu import create_model
from imagenet_models_tpu.ckpt.saver import export_pth_tar

out = os.environ.get("OUT", "/tmp/ft384")
model = create_model("ga_cswin_base", dtype=jnp.bfloat16)
v = jit_init(model, jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), training=False)
export_pth_tar(dict(v), "ga_cswin_base", os.path.join(out, "ga_cswin_base_224.pth.tar"))
print("exported 224 checkpoint")
EOF

# GA fine-tune recipe flags (GA/README.md 384 fine-tune: small LR, short run),
# truncated to 2 steps x 2 epochs for the drive
python train.py synthetic:64 --model ga_cswin_base_384 \
  --finetuning-checkpoint "$OUT/ga_cswin_base_224.pth.tar" \
  -b "${B:-8}" --epochs 2 --cooldown-epochs 0 --max-steps-per-epoch 2 \
  --opt lamb --lr 1e-4 --weight-decay 1e-8 --bce-loss --smoothing 0.1 \
  --mixup 0.8 --cutmix 1.0 --aa rand-m9-mstd0.5-inc1 --model-ema --amp \
  -j 2 --log-interval 1 --experiment ft384 --output "$OUT"

echo "=== summary ==="
cat "$OUT/ft384/summary.csv"
