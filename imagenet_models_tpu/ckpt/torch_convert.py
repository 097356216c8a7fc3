"""Bidirectional PyTorch <-> Flax checkpoint conversion.

The reference releases `.pth.tar` checkpoints (torch state_dicts, optional
'state_dict'/'state_dict_ema'/'model' wrapper keys, see
/root/reference/MAP/models/map_convnext.py:207-210 and timm CheckpointSaver).
BASELINE.md requires numerically interchangeable weights, so this module maps
torch tensors onto our Flax pytrees (and back) with shape-driven transforms:

  torch Conv2d  (O, I/g, kh, kw)  <->  flax Conv kernel  (kh, kw, I/g, O)
  torch Linear  (O, I)            <->  flax Dense kernel (I, O)
  torch grouped 1x1 Conv (O, I/g, 1, 1) <-> GroupedDense kernel (g, I/g, O/g)
  torch {weight,bias,running_mean,running_var} of norms
        <-> flax {scale,bias} params + {mean,var} batch_stats

Name translation is rule-based: each model family supplies an ordered list of
regex rewrites from torch module paths to flax module paths; the tensor-level
transform is inferred from the destination leaf's rank/shape.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

try:  # torch is only needed when actually reading/writing .pth.tar
    import torch
except Exception:  # pragma: no cover
    torch = None


# ---------------------------------------------------------------------------
# pytree flatten/unflatten with '/'-joined string paths
# ---------------------------------------------------------------------------

def flatten_dict(d: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in d.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_dict(v, p))
        else:
            out[p] = v
    return out


def unflatten_dict(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, v in flat.items():
        parts = path.split("/")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out


# ---------------------------------------------------------------------------
# name translation
# ---------------------------------------------------------------------------

class RuleTranslator:
    """Ordered regex rewrites applied to a torch module path (suffix stripped).

    Rules map e.g. `mmcap.mmcap.0.attention.1.attn.q` ->
    `mmcap/mmcap_0/attention_1/attn/q`. A rule is (pattern, replacement); all
    rules are applied in sequence with re.sub. Return None from a callable rule
    to drop the key.
    """

    def __init__(self, rules: Sequence[Tuple[str, Any]], drop: Sequence[str] = ()):  # noqa: D401
        self.rules = [(re.compile(p), r) for p, r in rules]
        self.drop = [re.compile(p) for p in drop]

    def __call__(self, path: str) -> Optional[str]:
        for p in self.drop:
            if p.search(path):
                return None
        for pat, rep in self.rules:
            path = pat.sub(rep, path)
        return path.replace(".", "/")


# Common rewrites shared by every model that embeds the MAP head library.
MAP_HEAD_RULES: List[Tuple[str, str]] = [
    (r"mmcap\.mmcap\.(\d+)", r"mmcap.mmcap_\1"),
    (r"attention\.(\d+)\.", r"attention_\1."),
    (r"self_dt_heads\.(\d+)\b", r"self_dt_heads_\1"),
    (r"\bheads\.(\d+)\b", r"heads_\1"),
    # ConvNormAct-style Sequentials: .0 = conv, .1 = bn
    (r"(ch_reduction|concat_conv|channel_convertor|gram_contraction|gram_embedding)\.0$", r"\1.conv"),
    (r"(ch_reduction|concat_conv|channel_convertor|gram_contraction|gram_embedding)\.1$", r"\1.bn"),
    (r"bp_reduction\.0$", r"bp_reduction"),
    (r"bp_reduction\.1$", r"bp_bn"),
    # SplitNormHead per-token lists
    (r"norm\.(\d+)$", r"norm_\1"),
    (r"head\.(\d+)$", r"head_\1"),
]


# ---------------------------------------------------------------------------
# tensor transforms
# ---------------------------------------------------------------------------

def _resize_rel_pos_table(tval: np.ndarray, fshape: Tuple[int, ...],
                          path: str) -> np.ndarray:
    """Re-resolve a relative-position bias table to a new window size.

    The reference swaps in a fresh table via `change_img_size`
    (/root/reference/MAP/models/map_maxvit.py:1276-1283), losing the learned
    bias; here the (2H-1, 2W-1) lattice is bilinearly interpolated instead
    (timm resize_rel_pos_bias_table semantics) so a 224 checkpoint stays
    usable at e.g. 384. Layouts: TF (heads, 2H-1, 2W-1) and
    ((2H-1)*(2W-1), heads)."""
    import jax.numpy as jnp

    from imagenet_models_tpu.nn.layers import resize_bilinear

    if tval.ndim == 3 and len(fshape) == 3:  # (heads, h, w)
        x = jnp.asarray(tval.transpose(1, 2, 0), jnp.float32)[None]
        out = np.asarray(resize_bilinear(x, tuple(fshape[1:3]))[0])
        return out.transpose(2, 0, 1).astype(tval.dtype)
    if tval.ndim == 2 and len(fshape) == 2:  # (L, heads), L = (2H-1)^2
        sl = int(round(float(np.sqrt(tval.shape[0]))))
        tl = int(round(float(np.sqrt(fshape[0]))))
        if sl * sl != tval.shape[0] or tl * tl != fshape[0]:
            raise ValueError(f"non-square rel-pos table at {path}: "
                             f"{tval.shape} -> {fshape}")
        x = jnp.asarray(tval.reshape(sl, sl, -1), jnp.float32)[None]
        out = np.asarray(resize_bilinear(x, (tl, tl))[0])
        return out.reshape(tl * tl, -1).astype(tval.dtype)
    raise ValueError(f"cannot re-resolve rel-pos table at {path}: "
                     f"{tval.shape} -> {fshape}")


def _to_flax(tval: np.ndarray, target: np.ndarray, path: str) -> np.ndarray:
    tshape, fshape = tuple(tval.shape), tuple(target.shape)
    if "relative_position_bias_table" in path and tshape != fshape:
        return _resize_rel_pos_table(tval, fshape, path)
    if tshape == fshape and tval.ndim <= 2 and not (tval.ndim == 2 and path.endswith("kernel")):
        return tval
    if path.endswith("kernel"):
        if target.ndim == 4:  # conv HWIO <- OIHW
            if tval.ndim == 2:  # torch Linear used as 1x1 conv
                tval = tval[:, :, None, None]
            return np.transpose(tval, (2, 3, 1, 0))
        if target.ndim == 3:  # GroupedDense (g, i, o) <- (O, I/g[,1,1])
            g, i, o = fshape
            w = tval.reshape(g * o, i)
            return np.transpose(w.reshape(g, o, i), (0, 2, 1))
        if target.ndim == 2:  # Dense (I, O) <- (O, I[,1,1])
            w = tval.reshape(tval.shape[0], -1)
            return np.transpose(w, (1, 0))
    if tshape == fshape:
        return tval
    # 4-D NCHW parameter (e.g. PiT pos_embed, map_pit.py:106-111) -> NHWC
    if tval.ndim == 4 and np.transpose(tval, (0, 2, 3, 1)).shape == fshape:
        return np.transpose(tval, (0, 2, 3, 1))
    if tval.size == target.size:
        return tval.reshape(fshape)
    raise ValueError(f"shape mismatch at {path}: torch {tshape} vs flax {fshape}")


def _to_torch(fval: np.ndarray, path: str) -> np.ndarray:
    if path.endswith("kernel"):
        if fval.ndim == 4:
            return np.transpose(fval, (3, 2, 0, 1))
        if fval.ndim == 3:
            g, i, o = fval.shape
            return np.transpose(fval, (0, 2, 1)).reshape(g * o, i)[:, :, None, None]
        if fval.ndim == 2:
            return np.transpose(fval, (1, 0))
    # NHWC spatial parameter (PiT pos_embed) back to torch NCHW
    if path.endswith("pos_embed") and fval.ndim == 4:
        return np.transpose(fval, (0, 3, 1, 2))
    return fval


_SUFFIX_CANDIDATES = {
    "weight": [("params", "kernel"), ("params", "scale")],
    "bias": [("params", "bias")],
    "running_mean": [("batch_stats", "mean")],
    "running_var": [("batch_stats", "var")],
    "num_batches_tracked": [],
    # bare parameters (x_cls, gamma, pos_embed) translate to themselves
}


def convert_torch_state_dict(
    state_dict: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    translate: Callable[[str], Optional[str]],
    strict: bool = True,
) -> Dict[str, Any]:
    """Produce a new variables dict with values from the torch state_dict."""
    flat = {col: flatten_dict(variables.get(col, {})) for col in ("params", "batch_stats")}
    new = {col: dict(v) for col, v in flat.items()}
    assigned = set()
    missing_src = []

    for tkey, tval in state_dict.items():
        tval = np.asarray(tval)
        if "." in tkey:
            prefix, suffix = tkey.rsplit(".", 1)
        else:
            prefix, suffix = tkey, ""
        if suffix in _SUFFIX_CANDIDATES:
            if not _SUFFIX_CANDIDATES[suffix]:
                continue  # num_batches_tracked
            base = translate(prefix)
            if base is None:
                continue
            placed = False
            for col, leaf in _SUFFIX_CANDIDATES[suffix]:
                path = f"{base}/{leaf}"
                if path in flat[col]:
                    new[col][path] = _to_flax(tval, np.asarray(flat[col][path]), path)
                    assigned.add((col, path))
                    placed = True
                    break
            if not placed:
                missing_src.append(tkey)
        else:
            base = translate(tkey)
            if base is None:
                continue
            for col in ("params", "batch_stats"):
                if base in flat[col]:
                    new[col][base] = _to_flax(tval, np.asarray(flat[col][base]), base)
                    assigned.add((col, base))
                    break
            else:
                missing_src.append(tkey)

    unassigned = [
        (col, p) for col in ("params", "batch_stats") for p in flat[col]
        if (col, p) not in assigned
    ]
    if strict and (missing_src or unassigned):
        raise ValueError(
            "checkpoint conversion mismatch:\n"
            f"  torch keys with no flax home: {missing_src[:20]} (total {len(missing_src)})\n"
            f"  flax leaves not filled: {unassigned[:20]} (total {len(unassigned)})")

    out = dict(variables)
    for col in ("params", "batch_stats"):
        if flat[col]:
            out[col] = unflatten_dict(new[col])
    return out


def export_torch_state_dict(
    variables: Dict[str, Any],
    translate_back: Callable[[str], Optional[str]],
) -> Dict[str, np.ndarray]:
    """Flax variables -> torch-layout state_dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}
    leaf_to_suffix = {"kernel": "weight", "scale": "weight", "bias": "bias",
                      "mean": "running_mean", "var": "running_var"}
    for col in ("params", "batch_stats"):
        for path, val in flatten_dict(variables.get(col, {})).items():
            val = np.asarray(val)
            parts = path.split("/")
            leaf = parts[-1]
            base = "/".join(parts[:-1])
            suffix = leaf_to_suffix.get(leaf)
            tbase = translate_back(base if suffix else path)
            if tbase is None:
                continue
            tkey = f"{tbase}.{suffix}" if suffix else tbase
            out[tkey] = _to_torch(val, path)
            for dup in getattr(translate_back, "alias_keys", lambda k: ())(tkey):
                out[dup] = out[tkey]
    return out


def load_torch_checkpoint(path: str, use_ema: bool = False) -> Dict[str, np.ndarray]:
    """Read a reference .pth.tar / .pth checkpoint into numpy arrays."""
    if torch is None:
        raise RuntimeError("torch unavailable; cannot read .pth checkpoints")
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        if use_ema and "state_dict_ema" in ckpt:
            ckpt = ckpt["state_dict_ema"]
        elif "state_dict" in ckpt:
            ckpt = ckpt["state_dict"]
        elif "model" in ckpt and isinstance(ckpt["model"], dict):
            ckpt = ckpt["model"]
    out = {}
    for k, v in ckpt.items():
        k = k[7:] if k.startswith("module.") else k  # DDP prefix
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out
