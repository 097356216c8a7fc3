"""Fine-tune checkpoint surgery (reference: MAP/train.py:459-481).

Loading a torch checkpoint for fine-tuning either (a) remaps a 21k-class
classifier fc to the 1k label space through an external class-map JSON
(`{"in1k_idx": [...], "in21k_idx": [...]}`, reference --in21k_1k_map), with
the one missing class (850) initialised to the 21k mean row, or (b) drops
the head fc weights entirely so the fresh-init fc is trained from scratch.
The reference operates on the raw torch state_dict before load_state_dict
(strict=False); we do the same on the numpy state dict before the
name-map conversion."""

from __future__ import annotations

import json
from typing import Any, Dict

import numpy as np

# classifier-fc layouts across the zoo: FB-style `head` Linear
# (map_convnext.py:95), timm `head.fc`, and NormMlp-style `head.fc2`
# (the reference surgery hardcodes head.fc2, MAP/train.py:474-477)
_FC_SUFFIXES = ("head.weight", "head.bias",
                "head.fc.weight", "head.fc.bias",
                "head.fc2.weight", "head.fc2.bias")


def apply_finetune_checkpoint(variables: Dict[str, Any], model_name: str,
                              path: str, *, in21k_to_in1k: bool = False,
                              map_path: str = "in21k_1k_map.json"):
    """Returns (variables with the checkpoint loaded, number of fc keys
    remapped-or-dropped) per MAP/train.py:462-477."""
    from imagenet_models_tpu.ckpt.pretrained import translator_for
    from imagenet_models_tpu.ckpt.torch_convert import (
        convert_torch_state_dict, load_torch_checkpoint)

    sd = load_torch_checkpoint(path)
    fc_keys = [k for k in sd if k.endswith(_FC_SUFFIXES)]
    if in21k_to_in1k:
        with open(map_path) as f:
            class_map = json.load(f)
        for k in fc_keys:
            old = sd[k]
            new = np.zeros((1000,) + old.shape[1:], old.dtype)
            new[class_map["in1k_idx"]] = old[class_map["in21k_idx"]]
            new[850] = old.mean(0)  # class 850 missing in the map
            sd[k] = new
    else:
        for k in fc_keys:
            sd.pop(k)
    variables = convert_torch_state_dict(sd, variables, translator_for(model_name),
                                         strict=False)
    return variables, len(fc_keys)
