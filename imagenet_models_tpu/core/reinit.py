"""Reference-faithful weight re-initialization for from-scratch training.

Our flax modules default every kernel to timm's trunc_normal(std=.02) — which
is exactly what the ConvNeXt families do to Conv2d AND Linear
(/root/reference/GA/ga_convnext.py:508-516, MAP/models/map_convnext.py
_init_weights), but the other reference families initialize differently:

- map_resnet  (map_resnet.py:423-441): Conv2d kaiming_normal(mode='fan_out',
  relu); Linear trunc_normal(.02) + zero bias; `zero_init_last` zeroes the
  final BN gamma (conv3[1].weight) of every BottleNeck so residual branches
  start as identity.
- ga_cswin    (ga_cswin.py:598-605): Linear trunc_normal(.02) + zero bias;
  LayerNorm/BN set to 1/0; **convs are left at torch's default** —
  kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for the kernel and
  U(+-1/sqrt(fan_in)) for the bias.
- map_fastervit (map_fastervit.py:955-965): same split as ga_cswin.
- map_pit     (map_pit.py:154-157): only LayerNorm is set; Linear AND conv
  keep torch defaults (pos_embed is trunc_normal'd explicitly, :151).
- map_mobilenet (map_mobilenet.py): no custom init at all — everything,
  including the MAPHead's Linears, keeps torch defaults.

Checkpoint loads overwrite everything, so this pass only affects
from-scratch training dynamics. It runs on the freshly-initialized variables
(train.py/validate.py call it right after jit_init); family resolution is by
model name; unknown/ConvNeXt/MaxViT names return the tree unchanged (MaxViT's
per-module 'vit_eff' scheme is matched in the model file itself).
"""

from __future__ import annotations

import math
import zlib
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _family(model_name: str) -> Optional[str]:
    n = model_name.lower()
    if "resnet" in n:
        return "resnet"
    if "cswin" in n:
        return "torch_conv"          # Linear trunc-normal'd by the model
    if "faster_vit" in n or "fastervit" in n:
        return "torch_conv"
    if "pit" in n:
        return "torch_all"           # Linear + conv both torch default
    if "mobilenet" in n:
        return "torch_all"
    return None                       # convnext/maxvit/unknown: leave as-is


def _fan_in(kernel_shape) -> int:
    """torch fan_in: conv (kh,kw,in/g,out) -> in/g*kh*kw; grouped dense
    (g,in/g,out/g) -> in/g; dense (in,out) -> in."""
    if len(kernel_shape) == 4:
        return int(np.prod(kernel_shape[:3]))
    if len(kernel_shape) == 3:
        return int(kernel_shape[1])
    return int(kernel_shape[0])


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def reference_init(model_name: str, variables: Dict[str, Any], seed: int = 0):
    """Rewrite `variables['params']` to the reference init scheme (see module
    docstring). Deterministic per (seed, param path). Returns `variables`
    (new tree; input not mutated)."""
    fam = _family(model_name)
    if fam is None:
        return variables

    base = jax.random.PRNGKey(seed ^ 0x5EED1217)
    torch_dense = fam == "torch_all"

    def rewrite(tree, path):
        out = {}
        kernel = tree.get("kernel")
        for name, leaf in tree.items():
            p = path + (name,)
            if isinstance(leaf, dict):
                out[name] = rewrite(leaf, p)
                continue
            key = jax.random.fold_in(base, zlib.crc32("/".join(p).encode()))
            new = leaf
            if name == "kernel" and leaf.ndim >= 3:
                # conv / grouped-conv kernels
                if fam == "resnet":
                    # kaiming_normal fan_out, relu gain
                    fan_out = int(leaf.shape[-1] * np.prod(leaf.shape[:2])) \
                        if leaf.ndim == 4 else int(leaf.shape[-1])
                    new = jax.random.normal(key, leaf.shape, leaf.dtype) \
                        * math.sqrt(2.0 / fan_out)
                else:
                    b = 1.0 / math.sqrt(_fan_in(leaf.shape))
                    new = _uniform(key, leaf.shape, b, leaf.dtype)
            elif name == "kernel" and leaf.ndim == 2 and torch_dense:
                if "pos_embed" not in "/".join(p):
                    b = 1.0 / math.sqrt(_fan_in(leaf.shape))
                    new = _uniform(key, leaf.shape, b, leaf.dtype)
            elif name == "bias" and kernel is not None and not isinstance(kernel, dict):
                # torch default bias: U(+-1/sqrt(fan_in of the sibling kernel))
                conv_like = kernel.ndim >= 3
                if (conv_like and fam != "resnet") or (kernel.ndim == 2 and torch_dense):
                    b = 1.0 / math.sqrt(_fan_in(kernel.shape))
                    new = _uniform(key, leaf.shape, b, leaf.dtype)
            elif fam == "resnet" and name == "scale" and len(path) >= 2 \
                    and path[-1] == "bn" and path[-2].startswith("conv3"):
                # zero_init_last (map_resnet.py:438-441)
                new = jnp.zeros_like(leaf)
            out[name] = new
        return out

    new_vars = dict(variables)
    new_vars["params"] = rewrite(variables["params"], ())
    return new_vars
