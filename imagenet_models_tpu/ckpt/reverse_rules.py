"""Reverse name translation (flax path -> torch dotted key) for .pth.tar
export — the inverse of each model family's forward rules in its model file.
Validated by round-trip tests (torch sd -> flax -> torch sd must be
key/value-identical)."""

from __future__ import annotations

import fnmatch
import re
from typing import Dict, List, Optional, Sequence, Tuple


class ReverseTranslator:
    def __init__(self, rules: Sequence[Tuple[str, str]],
                 aliases: Sequence[Tuple[str, str]] = ()):
        self.rules = [(re.compile(p), r) for p, r in rules]
        # torch modules registered under TWO parents (e.g. FasterViT's
        # TokenInitializer.pos_embed, also reachable as to_global_feature.pos,
        # map_fastervit.py:732-735) appear twice in a reference state_dict;
        # aliases re-emit such keys under the duplicate path on export
        self.aliases = [(re.compile(p), r) for p, r in aliases]

    def __call__(self, path: str) -> Optional[str]:
        path = path.replace("/", ".")
        for pat, rep in self.rules:
            path = pat.sub(rep, path)
        return path

    def alias_keys(self, tkey: str) -> List[str]:
        """Duplicate torch keys this key must also be written under."""
        out = []
        for pat, rep in self.aliases:
            if pat.search(tkey):
                out.append(pat.sub(rep, tkey))
        return out


# inverse of MAP_HEAD_RULES (ckpt/torch_convert.py)
MAP_HEAD_REVERSE: List[Tuple[str, str]] = [
    (r"mmcap\.mmcap_(\d+)", r"mmcap.mmcap.\1"),
    (r"attention_(\d+)\.", r"attention.\1."),
    (r"self_dt_heads_(\d+)", r"self_dt_heads.\1"),
    (r"\bheads_(\d+)", r"heads.\1"),
    (r"(ch_reduction|concat_conv|channel_convertor|gram_contraction|gram_embedding)\.conv\b", r"\1.0"),
    (r"(ch_reduction|concat_conv|channel_convertor|gram_contraction|gram_embedding)\.bn\b", r"\1.1"),
    (r"bp_reduction\b(?!\.)", "bp_reduction.0"),
    (r"bp_bn\b", "bp_reduction.1"),
    (r"norm_(\d+)$", r"norm.\1"),
    (r"head_(\d+)$", r"head.\1"),
]

CONVNEXT_REVERSE = [
    (r"downsample_layers_0_conv", "downsample_layers.0.0"),
    (r"downsample_layers_0_norm", "downsample_layers.0.1"),
    (r"downsample_layers_(\d+)_norm", r"downsample_layers.\1.0"),
    (r"downsample_layers_(\d+)_conv", r"downsample_layers.\1.1"),
    (r"stages_(\d+)_blocks_(\d+)\.", r"stages.\1.\2."),
] + MAP_HEAD_REVERSE

GA_CONVNEXT_REVERSE = [
    (r"^stem_conv", "stem.0"),
    (r"^stem_norm", "stem.1"),
    (r"^stage4\.downsample_conv", "stages.4.downsample.0"),
    (r"^stage4\.downsample_bn", "stages.4.downsample.1"),
    (r"^stage4\.", "stages.4."),
    (r"^stages_(\d)\.downsample_norm", r"stages.\1.downsample.0"),
    (r"^stages_(\d)\.downsample_conv", r"stages.\1.downsample.1"),
    (r"^stages_(\d)\.blocks_(\d+)\.", r"stages.\1.blocks.\2."),
    (r"^gram_contraction_(\d+)_conv", r"gram_contraction.\1.0"),
    (r"^gram_contraction_(\d+)_bn", r"gram_contraction.\1.1"),
    (r"^gram_layer_(\d+)\.blocks_(\d+)\.", r"gram_layer.\1.blocks.\2."),
    (r"^gram_embedding_(\d+)_bn", r"gram_embedding.\1.1"),
    (r"^gram_embedding_(\d+)", r"gram_embedding.\1.0"),
    (r"^ga_(\d+)\.", r"ga.\1."),
    (r"^fc_(\d+)$", r"fc.\1"),
]

RESNET_REVERSE = [
    (r"^stem_(\d+)\.conv", r"stem.\1.0"),
    (r"^stem_(\d+)\.bn", r"stem.\1.1"),
    (r"^layer(\d+)_(\d+)\.", r"layer\1.\2."),
    (r"\bconv(\d)\.conv", r"conv\1.0"),
    (r"\bconv(\d)\.bn", r"conv\1.1"),
    (r"\bdownsample\.conv", "downsample.0"),
    (r"\bdownsample\.bn", "downsample.1"),
    (r"\bse\.fc1\.conv", "se.1.0"),
    (r"\bse\.fc1\.bn", "se.1.1"),
    (r"\bse\.fc2", "se.2"),
] + MAP_HEAD_REVERSE

MOBILENET_REVERSE = [
    (r"^layers_(\d+)_(\d+)\.conv0", r"layers.\1.\2.0"),
    (r"^layers_(\d+)_(\d+)\.bn0", r"layers.\1.\2.1"),
    (r"^layers_(\d+)_(\d+)\.conv1", r"layers.\1.\2.3"),
    (r"^layers_(\d+)_(\d+)\.bn1", r"layers.\1.\2.4"),
] + MAP_HEAD_REVERSE

PIT_REVERSE = [
    (r"^transformers_(\d+)_blocks_(\d+)\.", r"transformers.\1.blocks.\2."),
    (r"^pools_(\d+)", r"pools.\1.conv"),
    (r"^patch_embed$", "patch_embed.conv"),
] + MAP_HEAD_REVERSE

_REVERSE: Dict[str, List[Tuple[str, str]]] = {
    "convnext_*": CONVNEXT_REVERSE,
    "map_convnext_*": CONVNEXT_REVERSE,
    "ga_convnext_*": GA_CONVNEXT_REVERSE,
    "*resnet50": RESNET_REVERSE,
    "*mobilenet_v1": MOBILENET_REVERSE,
    "*pit_s": PIT_REVERSE,
}


_ALIASES: Dict[str, List[Tuple[str, str]]] = {}


def register_reverse_rules(pattern: str, rules: Sequence[Tuple[str, str]],
                           aliases: Sequence[Tuple[str, str]] = ()):
    _REVERSE[pattern] = list(rules)
    if aliases:
        _ALIASES[pattern] = list(aliases)


def reverse_translator(model_name: str) -> ReverseTranslator:
    for pattern, rules in _REVERSE.items():
        if fnmatch.fnmatch(model_name, pattern):
            return ReverseTranslator(rules, aliases=_ALIASES.get(pattern, ()))
    raise KeyError(f"no reverse conversion rules for {model_name}")
