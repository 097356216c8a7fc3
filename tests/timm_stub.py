"""Minimal timm/torchsummary stand-ins so the REAL reference model files
(/root/reference/{MAP/models,GA}/*.py) import and run without network or a
timm install.

This exists for one purpose: full-model checkpoint-interchange parity tests
(VERDICT round-1 missing #1). The reference models import timm only for the
registry, init helpers, and a handful of standard layers; re-providing those
faithfully (same state_dict key layout, same math — timm==0.9.2 generation,
the version MAP pins) lets the tests instantiate the reference's actual torch
modules, randomize them, write reference-format .pth.tar files and demand
logit parity from our stack.

Only what the reference files actually exercise is implemented; anything else
raises so a silent stub can never fake a pass.
"""

from __future__ import annotations

import importlib
import math
import sys
import types

import torch
import torch.nn.functional as F
from torch import nn

# ---------------------------------------------------------------------------
# timm layer re-implementations (timm 0.9.2 semantics, state-dict compatible)
# ---------------------------------------------------------------------------


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return nn.init.trunc_normal_(tensor, mean, std, a, b)


def trunc_normal_tf_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    # TF flavor: truncate on the unit normal, then scale
    nn.init.trunc_normal_(tensor, 0.0, 1.0, a, b)
    with torch.no_grad():
        tensor.mul_(std).add_(mean)
    return tensor


class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = float(drop_prob or 0.0)
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        mask = x.new_empty((x.shape[0],) + (1,) * (x.ndim - 1)).bernoulli_(keep)
        if self.scale_by_keep:
            mask = mask / keep
        return x * mask


class Mlp(nn.Module):
    """timm Mlp: fc1 -> act -> drop1 -> (norm) -> fc2 -> drop2."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, norm_layer=None, bias=True, drop=0.0,
                 use_conv=False):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        linear = nn.Conv2d if use_conv else nn.Linear
        if use_conv:
            self.fc1 = linear(in_features, hidden_features, 1, bias=bias)
            self.fc2 = linear(hidden_features, out_features, 1, bias=bias)
        else:
            self.fc1 = linear(in_features, hidden_features, bias=bias)
            self.fc2 = linear(hidden_features, out_features, bias=bias)
        self.act = act_layer()
        self.drop1 = nn.Dropout(drop)
        self.norm = norm_layer(hidden_features) if norm_layer else nn.Identity()
        self.drop2 = nn.Dropout(drop)

    def forward(self, x):
        return self.drop2(self.fc2(self.norm(self.drop1(self.act(self.fc1(x))))))


class ConvMlp(nn.Module):
    """timm ConvMlp: 1x1 convs with optional norm between."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.ReLU, norm_layer=None, bias=True, drop=0.0):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Conv2d(in_features, hidden_features, 1, bias=bias)
        self.norm = norm_layer(hidden_features) if norm_layer else nn.Identity()
        self.act = act_layer()
        self.drop = nn.Dropout(drop)
        self.fc2 = nn.Conv2d(hidden_features, out_features, 1, bias=bias)

    def forward(self, x):
        return self.fc2(self.drop(self.act(self.norm(self.fc1(x)))))


class LayerNorm(nn.LayerNorm):
    """channels-last LN (timm.layers.LayerNorm)."""


class LayerNorm2d(nn.LayerNorm):
    """channels-first LN (timm LayerNorm2d)."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = F.layer_norm(x, self.normalized_shape, self.weight, self.bias, self.eps)
        return x.permute(0, 3, 1, 2)


class SelectAdaptivePool2d(nn.Module):
    def __init__(self, pool_type="avg", flatten=False):
        super().__init__()
        self.pool_type = pool_type
        self.flatten = nn.Flatten(1) if flatten else nn.Identity()

    def forward(self, x):
        if self.pool_type:
            x = F.adaptive_avg_pool2d(x, 1)
        return self.flatten(x)


class NormMlpClassifierHead(nn.Module):
    """timm 0.9.2 NormMlpClassifierHead: 'A Pool -> Norm -> Mlp Classifier
    Head' — GAP, LayerNorm over the pooled vector, hidden fc + tanh, drop,
    fc. NCHW input; norm_layer is LayerNorm2d on the (B,C,1,1) pooled map."""

    def __init__(self, in_features, num_classes, hidden_size=None,
                 pool_type="avg", drop_rate=0.0, norm_layer=None):
        super().__init__()
        import collections

        self.global_pool = SelectAdaptivePool2d(pool_type)
        self.norm = (norm_layer or (lambda c: LayerNorm2d(c)))(in_features)
        self.flatten = nn.Flatten(1) if pool_type else nn.Identity()
        if hidden_size:
            self.pre_logits = nn.Sequential(collections.OrderedDict([
                ("fc", nn.Linear(in_features, hidden_size)),
                ("act", nn.Tanh()),
            ]))
            in_features = hidden_size
        else:
            self.pre_logits = nn.Identity()
        self.drop = nn.Dropout(drop_rate)
        self.fc = nn.Linear(in_features, num_classes) if num_classes > 0 else nn.Identity()

    def forward(self, x, pre_logits=False):
        x = self.global_pool(x)
        x = self.norm(x)
        x = self.flatten(x)
        x = self.pre_logits(x)
        x = self.drop(x)
        return x if pre_logits else self.fc(x)


class ClassifierHead(nn.Module):
    def __init__(self, in_features, num_classes, pool_type="avg", drop_rate=0.0,
                 use_conv=False):
        super().__init__()
        self.global_pool = SelectAdaptivePool2d(pool_type, flatten=True)
        self.drop = nn.Dropout(drop_rate)
        self.fc = nn.Linear(in_features, num_classes) if num_classes > 0 else nn.Identity()
        self.flatten = nn.Identity()

    def forward(self, x, pre_logits=False):
        x = self.drop(self.global_pool(x))
        return x if pre_logits else self.fc(x)


class SEModule(nn.Module):
    """timm SEModule ('se' in create_attn): fc1 -> act -> fc2 -> gate."""

    def __init__(self, channels, rd_ratio=1.0 / 16, rd_channels=None, **kwargs):
        super().__init__()
        # timm SEModule: rd = make_divisible(channels * rd_ratio, 8, round_limit=0.)
        rd = rd_channels or make_divisible(channels * rd_ratio, 8, round_limit=0.0)
        self.fc1 = nn.Conv2d(channels, rd, 1, bias=True)
        self.bn = nn.Identity()
        self.act = nn.ReLU(inplace=True)
        self.fc2 = nn.Conv2d(rd, channels, 1, bias=True)
        self.gate = nn.Sigmoid()

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.fc2(self.act(self.bn(self.fc1(s))))
        return x * self.gate(s)


def create_attn(attn_type, channels, **kwargs):
    if attn_type is None:
        return None
    if attn_type == "se":
        return SEModule(channels, **kwargs)
    raise NotImplementedError(f"timm_stub: create_attn({attn_type!r})")


# --- ViT Block (timm 0.9.2 vision_transformer.Block) ---


class _ViTAttention(nn.Module):
    def __init__(self, dim, num_heads=8, qkv_bias=False, qk_norm=False,
                 attn_drop=0.0, proj_drop=0.0, norm_layer=nn.LayerNorm):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.q_norm = norm_layer(self.head_dim) if qk_norm else nn.Identity()
        self.k_norm = norm_layer(self.head_dim) if qk_norm else nn.Identity()
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj = nn.Linear(dim, dim)
        self.proj_drop = nn.Dropout(proj_drop)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads, self.head_dim).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        q, k = self.q_norm(q), self.k_norm(k)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = self.attn_drop(attn.softmax(dim=-1))
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj_drop(self.proj(x))


class _LayerScale(nn.Module):
    def __init__(self, dim, init_values=1e-5, inplace=False):
        super().__init__()
        self.gamma = nn.Parameter(init_values * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class ViTBlock(nn.Module):
    """timm 0.9.2 Block: pre-norm attn + MLP with optional layer-scale."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                 qk_norm=False, proj_drop=0.0, attn_drop=0.0, init_values=None,
                 drop_path=0.0, act_layer=nn.GELU, norm_layer=nn.LayerNorm,
                 mlp_layer=Mlp, drop=0.0):
        super().__init__()
        self.norm1 = norm_layer(dim)
        self.attn = _ViTAttention(dim, num_heads=num_heads, qkv_bias=qkv_bias,
                                  qk_norm=qk_norm, attn_drop=attn_drop,
                                  proj_drop=proj_drop or drop)
        self.ls1 = _LayerScale(dim, init_values) if init_values else nn.Identity()
        self.drop_path1 = DropPath(drop_path) if drop_path > 0 else nn.Identity()
        self.norm2 = norm_layer(dim)
        self.mlp = mlp_layer(dim, hidden_features=int(dim * mlp_ratio),
                             act_layer=act_layer, drop=proj_drop or drop)
        self.ls2 = _LayerScale(dim, init_values) if init_values else nn.Identity()
        self.drop_path2 = DropPath(drop_path) if drop_path > 0 else nn.Identity()

    def forward(self, x):
        x = x + self.drop_path1(self.ls1(self.attn(self.norm1(x))))
        x = x + self.drop_path2(self.ls2(self.mlp(self.norm2(x))))
        return x


# ---------------------------------------------------------------------------
# misc helpers
# ---------------------------------------------------------------------------


def to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


def extend_tuple(x, n):
    x = tuple(x) if isinstance(x, (tuple, list)) else (x,)
    return x + (x[-1],) * (n - len(x))


def make_divisible(v, divisor=8, min_value=None, round_limit=0.9):
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return int(new_v)


def _assert(cond, msg=""):
    assert cond, msg


def named_apply(fn, module, name="", depth_first=True, include_root=False):
    if not depth_first and include_root:
        fn(module=module, name=name)
    for child_name, child in module.named_children():
        child_name = ".".join((name, child_name)) if name else child_name
        named_apply(fn, child, name=child_name, include_root=True)
    if depth_first and include_root:
        fn(module=module, name=name)
    return module


def checkpoint_seq(functions, x, *args, **kwargs):
    if isinstance(functions, (nn.Sequential, nn.ModuleList)):
        functions = list(functions)
    for fn in functions:
        x = fn(x)
    return x


def build_model_with_cfg(model_cls, variant, pretrained, **kwargs):
    assert not pretrained, "timm_stub cannot download pretrained weights"
    model_cfg = kwargs.pop("model_cfg", None)
    for k in ("pretrained_cfg", "pretrained_cfg_overlay", "default_cfg",
              "feature_cfg", "pretrained_strict", "pretrained_filter_fn",
              "kwargs_filter"):
        kwargs.pop(k, None)
    if model_cfg is not None:
        return model_cls(cfg=model_cfg, **kwargs)
    return model_cls(**kwargs)


def _identity_decorator(fn=None, *args, **kwargs):
    if fn is None:
        return lambda f: f
    return fn


def use_fused_attn(**kwargs):
    return False


def get_act_layer(name="relu"):
    if not isinstance(name, str):
        return name
    table = {"relu": nn.ReLU, "gelu": nn.GELU, "silu": nn.SiLU,
             "gelu_tanh": lambda: nn.GELU(approximate="tanh")}
    return table[name]


def get_norm_layer(name):
    if not isinstance(name, str):
        return name
    table = {"layernorm": LayerNorm, "layernorm2d": LayerNorm2d,
             "batchnorm2d": nn.BatchNorm2d, "batchnorm": nn.BatchNorm2d}
    return table[name]


class BatchNormAct2d(nn.BatchNorm2d):
    """timm BatchNormAct2d: BN params live at the module root (state-dict
    compatible with plain BatchNorm2d) with a fused act."""

    def __init__(self, num_features, eps=1e-5, momentum=0.1, affine=True,
                 track_running_stats=True, apply_act=True, act_layer=nn.ReLU,
                 act_kwargs=None, inplace=True, drop_layer=None):
        super().__init__(num_features, eps=eps, momentum=momentum, affine=affine,
                         track_running_stats=track_running_stats)
        self.drop = drop_layer() if drop_layer else nn.Identity()
        if apply_act and act_layer is not None:
            act_layer = get_act_layer(act_layer)
            try:
                self.act = act_layer(inplace=inplace)
            except TypeError:
                self.act = act_layer()
        else:
            self.act = nn.Identity()

    def forward(self, x):
        return self.act(self.drop(super().forward(x)))


def get_norm_act_layer(norm_layer, act_layer=None):
    norm_layer = get_norm_layer(norm_layer)
    if norm_layer in (nn.BatchNorm2d,):
        def factory(num_features, **kwargs):
            kwargs.setdefault("act_layer", act_layer or nn.ReLU)
            return BatchNormAct2d(num_features, **kwargs)
        return factory
    raise NotImplementedError(f"timm_stub: get_norm_act_layer({norm_layer})")


# --- conv/pool with TF 'same' padding (timm create_conv2d/create_pool2d) ---


def _same_pad(i, k, s, d=1):
    return max((math.ceil(i / s) - 1) * s + (k - 1) * d + 1 - i, 0)


class Conv2dSame(nn.Conv2d):
    def forward(self, x):
        ih, iw = x.shape[-2:]
        ph = _same_pad(ih, self.kernel_size[0], self.stride[0], self.dilation[0])
        pw = _same_pad(iw, self.kernel_size[1], self.stride[1], self.dilation[1])
        x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
        return F.conv2d(x, self.weight, self.bias, self.stride, (0, 0),
                        self.dilation, self.groups)


def create_conv2d(in_chs, out_chs, kernel_size, stride=1, dilation=1,
                  padding="", bias=False, groups=1, depthwise=False, **kwargs):
    if depthwise:
        groups = in_chs
    if padding == "same":
        # dynamic only when the geometry is actually asymmetric
        return Conv2dSame(in_chs, out_chs, kernel_size, stride=stride,
                          dilation=dilation, groups=groups, bias=bias)
    if padding in ("", None):
        padding = ((kernel_size - 1) // 2) * dilation
    return nn.Conv2d(in_chs, out_chs, kernel_size, stride=stride,
                     padding=padding, dilation=dilation, groups=groups, bias=bias)


class _PoolSame(nn.Module):
    def __init__(self, pool_type, kernel_size, stride):
        super().__init__()
        self.pool_type, self.k, self.s = pool_type, kernel_size, stride

    def forward(self, x):
        ih, iw = x.shape[-2:]
        ph, pw = _same_pad(ih, self.k, self.s), _same_pad(iw, self.k, self.s)
        pad = (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2)
        if self.pool_type == "max":
            x = F.pad(x, pad, value=-float("inf"))
            return F.max_pool2d(x, self.k, self.s)
        x = F.pad(x, pad)
        return F.avg_pool2d(x, self.k, self.s, count_include_pad=False)


def create_pool2d(pool_type, kernel_size, stride=None, padding="", **kwargs):
    stride = stride or kernel_size
    if padding == "same":
        return _PoolSame(pool_type, kernel_size, stride)
    if padding in ("", None):
        padding = 0
    if pool_type == "max":
        return nn.MaxPool2d(kernel_size, stride, padding=padding)
    return nn.AvgPool2d(kernel_size, stride, padding=padding)


# --- relative position biases (timm.layers.pos_embed_rel) ---


def _rel_pos_index(win):
    wh, ww = win
    coords = torch.stack(torch.meshgrid(torch.arange(wh), torch.arange(ww),
                                        indexing="ij")).flatten(1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)


class RelPosBias(nn.Module):
    def __init__(self, window_size, num_heads, prefix_tokens=0):
        super().__init__()
        assert prefix_tokens == 0
        self.window_size = to_2tuple(window_size)
        area = self.window_size[0] * self.window_size[1]
        size = (2 * self.window_size[0] - 1) * (2 * self.window_size[1] - 1)
        self.relative_position_bias_table = nn.Parameter(torch.zeros(size, num_heads))
        self.register_buffer("relative_position_index",
                             _rel_pos_index(self.window_size).view(-1),
                             persistent=False)
        trunc_normal_(self.relative_position_bias_table, std=0.02)
        self.area = area

    def get_bias(self):
        bias = self.relative_position_bias_table[self.relative_position_index]
        return bias.view(self.area, self.area, -1).permute(2, 0, 1).unsqueeze(0)

    def forward(self, attn, shared_rel_pos=None):
        return attn + self.get_bias()


class RelPosBiasTf(nn.Module):
    def __init__(self, window_size, num_heads, prefix_tokens=0):
        super().__init__()
        assert prefix_tokens == 0
        self.window_size = to_2tuple(window_size)
        self.area = self.window_size[0] * self.window_size[1]
        size = (num_heads, 2 * self.window_size[0] - 1, 2 * self.window_size[1] - 1)
        self.relative_position_bias_table = nn.Parameter(torch.zeros(size))
        self.register_buffer("relative_position_index",
                             _rel_pos_index(self.window_size).view(-1),
                             persistent=False)

    def get_bias(self):
        table = self.relative_position_bias_table.flatten(1)
        bias = table[:, self.relative_position_index]
        return bias.view(-1, self.area, self.area).unsqueeze(0)

    def forward(self, attn, shared_rel_pos=None):
        return attn + self.get_bias()


class RelPosMlp(nn.Module):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("timm_stub: RelPosMlp not exercised by the paper configs")


# ---------------------------------------------------------------------------
# module tree assembly
# ---------------------------------------------------------------------------


def _mk(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def install():
    """Install the stub module tree (idempotent; refuses to shadow real timm)."""
    if "timm" in sys.modules:
        return
    try:
        importlib.import_module("timm")
        return  # a real timm exists; never shadow it
    except ImportError:
        pass

    def create_model(*args, **kwargs):
        raise NotImplementedError("timm_stub: instantiate model classes directly")

    def register_model(fn=None, *a, **k):
        return _identity_decorator(fn, *a, **k)

    timm = _mk("timm")
    timm.create_model = create_model
    timm.list_models = lambda *a, **k: []

    data = _mk("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    timm.data = data

    layers = _mk("timm.layers")
    for n, v in dict(
        Mlp=Mlp, ConvMlp=ConvMlp, DropPath=DropPath, LayerNorm=LayerNorm,
        LayerNorm2d=LayerNorm2d, ClassifierHead=ClassifierHead,
        NormMlpClassifierHead=NormMlpClassifierHead,
        SelectAdaptivePool2d=SelectAdaptivePool2d,
        create_attn=create_attn, get_act_layer=get_act_layer,
        get_norm_layer=get_norm_layer, get_norm_act_layer=get_norm_act_layer,
        create_conv2d=create_conv2d, create_pool2d=create_pool2d,
        trunc_normal_=trunc_normal_, trunc_normal_tf_=trunc_normal_tf_,
        to_2tuple=to_2tuple, extend_tuple=extend_tuple, make_divisible=make_divisible,
        _assert=_assert, RelPosMlp=RelPosMlp, RelPosBias=RelPosBias,
        RelPosBiasTf=RelPosBiasTf, use_fused_attn=use_fused_attn,
        Conv2dSame=Conv2dSame,
    ).items():
        setattr(layers, n, v)
    timm.layers = layers

    models = _mk("timm.models")
    models.register_model = register_model
    models.register_notrace_module = _identity_decorator
    models.register_notrace_function = _identity_decorator
    models.named_apply = named_apply
    models.build_model_with_cfg = build_model_with_cfg
    timm.models = models

    registry = _mk("timm.models.registry")
    registry.register_model = register_model
    models.registry = registry

    mlayers = _mk("timm.models.layers")
    for n in ("trunc_normal_", "DropPath", "Mlp", "ConvMlp", "create_attn",
              "ClassifierHead", "SelectAdaptivePool2d", "LayerNorm2d",
              "to_2tuple"):
        setattr(mlayers, n, getattr(layers, n))
    models.layers = mlayers

    vit = _mk("timm.models.vision_transformer")
    vit.Block = ViTBlock
    models.vision_transformer = vit

    builder = _mk("timm.models._builder")
    builder.build_model_with_cfg = build_model_with_cfg
    builder.resolve_pretrained_cfg = lambda *a, **k: types.SimpleNamespace(
        to_dict=lambda: {})
    builder._update_default_kwargs = lambda *a, **k: None
    models._builder = builder

    fx = _mk("timm.models._features_fx")
    fx.register_notrace_function = _identity_decorator
    fx.register_notrace_module = _identity_decorator
    models._features_fx = fx

    manip = _mk("timm.models._manipulate")
    manip.named_apply = named_apply
    manip.checkpoint_seq = checkpoint_seq
    models._manipulate = manip

    reg2 = _mk("timm.models._registry")
    reg2.register_model = register_model
    reg2.generate_default_cfgs = lambda cfgs: cfgs
    models._registry = reg2

    if "torchsummary" not in sys.modules:
        ts = _mk("torchsummary")
        ts.summary = lambda *a, **k: None


_REF_PATHS = ["/root/reference/MAP/models", "/root/reference/GA"]


def import_ref(module_name: str):
    """Import a reference model file (e.g. 'map_mobilenet', 'ga_convnext')
    with the stub installed. Returns the module.

    The reference paths are removed from sys.path again afterwards —
    leaving /root/reference/GA on the path would shadow the repo-root
    `train` module for every later test in the same pytest session."""
    install()
    added = [p for p in _REF_PATHS if p not in sys.path]
    sys.path[:0] = added
    try:
        return importlib.import_module(module_name)
    finally:
        for p in added:
            sys.path.remove(p)
