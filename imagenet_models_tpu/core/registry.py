"""Model registry: string name -> factory producing a Flax module.

Mirrors the public surface of the reference registry usage
(`timm.create_model(name, **kwargs)`, see /root/reference/GA/train.py:407-420 and
/root/reference/MAP/train.py:442-457) with a JAX-native twist: factories return a
`flax.linen.Module`; parameters are initialised separately with `init_model`.
"""

from __future__ import annotations

import fnmatch
from typing import Any, Callable, Dict, List, Optional

_REGISTRY: Dict[str, Callable[..., Any]] = {}
_DEFAULT_CFGS: Dict[str, Dict[str, Any]] = {}


def register_model(fn: Optional[Callable] = None, *, name: Optional[str] = None):
    """Decorator registering a model factory under its function name."""

    def _register(f: Callable) -> Callable:
        key = name or f.__name__
        if key in _REGISTRY:
            raise ValueError(f"duplicate model registration: {key}")
        _REGISTRY[key] = f
        return f

    if fn is not None:
        return _register(fn)
    return _register


def register_default_cfg(name: str, cfg: Dict[str, Any]) -> None:
    _DEFAULT_CFGS[name] = dict(cfg)


def default_cfg(name: str) -> Dict[str, Any]:
    """Data config for a model: input_size, crop_pct, interpolation, mean/std."""
    base = {
        "input_size": (224, 224, 3),
        "crop_pct": 0.875,
        "crop_mode": "center",
        "interpolation": "bicubic",
        "mean": (0.485, 0.456, 0.406),
        "std": (0.229, 0.224, 0.225),
        "num_classes": 1000,
    }
    base.update(_DEFAULT_CFGS.get(name, {}))
    return base


def create_model(model_name: str, pretrained: bool = False, checkpoint_path: str = "", **kwargs):
    """Build a Flax module for `model_name`.

    kwargs mirroring timm that are consumed here: num_classes, drop_rate,
    drop_path_rate. Unknown Nones are stripped (timm behaviour).
    """
    if model_name not in _REGISTRY:
        raise KeyError(
            f"Unknown model {model_name!r}. Known: {', '.join(sorted(_REGISTRY))}")
    kwargs = {k: v for k, v in kwargs.items() if v is not None}
    model = _REGISTRY[model_name](**kwargs)
    if pretrained or checkpoint_path:
        # Deferred import: ckpt pulls in torch-format converters.
        from imagenet_models_tpu.ckpt.pretrained import load_pretrained

        model = load_pretrained(model, model_name, checkpoint_path=checkpoint_path)
    return model


def list_models(filter: str = "", module: str = "") -> List[str]:
    names = sorted(_REGISTRY)
    if filter:
        names = [n for n in names if fnmatch.fnmatch(n, filter)]
    return names


def is_model(model_name: str) -> bool:
    return model_name in _REGISTRY
