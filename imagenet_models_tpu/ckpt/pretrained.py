"""Pretrained-weight loading: reference .pth.tar -> Flax variables.

Model files register their torch-key translation rules here so
`create_model(name, pretrained=True/checkpoint_path=...)` and validate.py's
`--checkpoint` can ingest reference checkpoints (numerical interchangeability
requirement, BASELINE.md).
"""

from __future__ import annotations

import fnmatch
from typing import Any, Dict, Optional, Sequence, Tuple

from imagenet_models_tpu.ckpt.torch_convert import (
    RuleTranslator,
    convert_torch_state_dict,
    load_torch_checkpoint,
)

# model-name glob -> (rules, drop)
_TORCH_RULES: Dict[str, Tuple[Sequence, Sequence]] = {}


def register_torch_rules(pattern: str, rules: Sequence, drop: Sequence = ()) -> None:
    _TORCH_RULES[pattern] = (list(rules), list(drop))


def translator_for(model_name: str) -> RuleTranslator:
    for pattern, (rules, drop) in _TORCH_RULES.items():
        if fnmatch.fnmatch(model_name, pattern):
            return RuleTranslator(rules, drop=drop)
    raise KeyError(f"no torch conversion rules registered for {model_name}")


def load_variables_from_torch(
    model_name: str,
    variables: Dict[str, Any],
    checkpoint_path: str,
    use_ema: bool = False,
    strict: bool = True,
) -> Dict[str, Any]:
    sd = load_torch_checkpoint(checkpoint_path, use_ema=use_ema)
    return convert_torch_state_dict(sd, variables, translator_for(model_name), strict=strict)


def find_local_pretrained(model_name: str) -> Optional[str]:
    """Resolve --pretrained to a local released checkpoint.

    The reference downloads release .pth.tar files from GitHub
    (e.g. /root/reference/MAP/models/map_convnext.py:206-210); this
    environment has no egress, so `--pretrained` searches, in order:
    $IMTPU_PRETRAINED_DIR, ./pretrained, ~/.cache/imtpu/checkpoints for
    <model_name>.pth.tar / .pth / .pt. Returns None when absent.
    """
    import os

    dirs = [os.environ.get("IMTPU_PRETRAINED_DIR", ""), "pretrained",
            os.path.expanduser("~/.cache/imtpu/checkpoints")]
    for d in dirs:
        if not d:
            continue
        for ext in (".pth.tar", ".pth", ".pt"):
            p = os.path.join(d, model_name + ext)
            if os.path.isfile(p):
                return p
    return None


def require_local_pretrained(model_name: str) -> str:
    p = find_local_pretrained(model_name)
    if p is None:
        raise FileNotFoundError(
            f"--pretrained: no local weights for {model_name}. The reference "
            "downloads release .pth.tar files; this environment has no "
            "network egress. Place the released checkpoint at "
            f"$IMTPU_PRETRAINED_DIR/{model_name}.pth.tar (or ./pretrained/, "
            "~/.cache/imtpu/checkpoints/), or pass --checkpoint/"
            "--initial-checkpoint explicitly.")
    return p


def load_pretrained(model, model_name: str, checkpoint_path: str = ""):
    """Attach a pending checkpoint path to the module for init-time loading.

    JAX separates module construction from parameter initialisation, so
    "pretrained" is realised when the caller initialises variables; we record
    the request on the module object.
    """
    if not checkpoint_path:
        raise ValueError(
            f"pretrained weights for {model_name} require --checkpoint/-cp with a local "
            ".pth.tar (this environment has no network egress)")
    object.__setattr__(model, "_pending_checkpoint", (model_name, checkpoint_path))
    return model
