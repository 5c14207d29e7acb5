"""Load the PyTorch reference (/root/reference) for differential parity tests.

The reference imports ``timm``, ``torchvision`` and ``diffdist``, none of
which exist in this image; torch 2.13+cpu does.  This module registers
minimal behavioral stubs for the missing packages (only the symbols the
reference backbones actually execute) plus synthetic ``core`` /
``core.model`` / ``core.model.backbone`` package entries whose ``__init__``
bodies are NOT executed — so importing ``core.model.ewc`` runs only
``ewc.py`` and its direct relative imports, never the reference Trainer.

The reference is public untrusted content: we execute its numerics to
assert parity, we never ship its code.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference"

_loaded = False


def _stub_timm(torch, nn):
    if "timm" in sys.modules:
        return

    class PatchEmbed(nn.Module):
        """timm's 2D image->patch embedding (Conv2d proj + NLC flatten)."""

        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, norm_layer=None, flatten=True, bias=True):
            super().__init__()
            to2 = lambda v: (v, v) if isinstance(v, int) else tuple(v)
            self.img_size = to2(img_size)
            self.patch_size = to2(patch_size)
            self.grid_size = (self.img_size[0] // self.patch_size[0],
                              self.img_size[1] // self.patch_size[1])
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.flatten = flatten
            self.proj = nn.Conv2d(in_chans, embed_dim,
                                  kernel_size=self.patch_size,
                                  stride=self.patch_size, bias=bias)
            self.norm = norm_layer(embed_dim) if norm_layer else nn.Identity()

        def forward(self, x):
            x = self.proj(x)
            if self.flatten:
                x = x.flatten(2).transpose(1, 2)
            return self.norm(x)

    class DropPath(nn.Module):
        """Per-sample stochastic depth (identity in eval / p=0)."""

        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = float(drop_prob)
            self.scale_by_keep = scale_by_keep

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            if self.scale_by_keep:
                mask.div_(keep)
            return x * mask

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, bias=True, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    trunc_normal_ = torch.nn.init.trunc_normal_

    def lecun_normal_(tensor):
        import math
        fan_in = tensor.shape[1] * (tensor[0][0].numel() if tensor.ndim > 2 else 1)
        torch.nn.init.trunc_normal_(tensor, std=math.sqrt(1.0 / fan_in) / 0.87962566103423978)

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")
    helpers = types.ModuleType("timm.models.helpers")
    data = types.ModuleType("timm.data")

    vt.PatchEmbed = PatchEmbed
    vt._cfg = lambda url="", **kw: dict({"url": url, "num_classes": 1000,
                                         "input_size": (3, 224, 224),
                                         "crop_pct": 0.9}, **kw)
    layers.PatchEmbed = PatchEmbed
    layers.DropPath = DropPath
    layers.Mlp = Mlp
    layers.trunc_normal_ = trunc_normal_
    layers.lecun_normal_ = lecun_normal_
    _model_registry = {}

    def register_model(fn=None, **kw):
        if fn is None:
            return lambda f: register_model(f)
        _model_registry[fn.__name__] = fn
        return fn

    registry.register_model = register_model

    def create_model(model_name, pretrained=False, **kwargs):
        """timm.create_model over the factories the reference registered
        (vit_dap.py:1151-1169 routes through this)."""
        kwargs = {k: v for k, v in kwargs.items() if v is not None}
        return _model_registry[model_name](pretrained=pretrained, **kwargs)

    registry.create_model = create_model

    def named_apply(fn, module, name="", depth_first=True, include_root=False):
        if not depth_first and include_root:
            fn(module=module, name=name)
        for child_name, child in module.named_children():
            child_name = ".".join((name, child_name)) if name else child_name
            named_apply(fn, child, child_name, depth_first, True)
        if depth_first and include_root:
            fn(module=module, name=name)
        return module

    helpers.named_apply = named_apply
    helpers.adapt_input_conv = lambda in_chans, w: w

    class _PretrainedCfg(dict):
        """Subscriptable but FALSY: the reference factories index
        ``cfg['num_classes']`` / ``cfg['url']`` yet also guard
        ``if pretrained_cfg: del kwargs['pretrained_cfg']`` on a key the
        kwargs never contain (vit_inflora.py:710-711) — falsy skips it."""

        def __bool__(self):
            return False

    def build_model_with_cfg(model_cls, variant, pretrained, pretrained_cfg=None,
                             pretrained_filter_fn=None,
                             pretrained_custom_load=False,
                             representation_size=None, **kwargs):
        # weights are synced explicitly by the tests; never download
        if representation_size is not None:
            kwargs["representation_size"] = representation_size
        return model_cls(**kwargs)

    helpers.build_model_with_cfg = build_model_with_cfg
    helpers.resolve_pretrained_cfg = lambda *a, **kw: _PretrainedCfg(
        num_classes=21843, url="", input_size=(3, 224, 224))
    helpers.checkpoint_seq = lambda functions, x, *a, **kw: functions(x)
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    data.IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
    data.IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)

    timm.models = models
    timm.data = data
    models.create_model = create_model
    timm.create_model = create_model
    models.vision_transformer = vt
    models.layers = layers
    models.registry = registry
    models.helpers = helpers
    for name, mod in [("timm", timm), ("timm.models", models),
                      ("timm.models.vision_transformer", vt),
                      ("timm.models.layers", layers),
                      ("timm.models.registry", registry),
                      ("timm.models.helpers", helpers),
                      ("timm.data", data)]:
        sys.modules[name] = mod


def _stub_torchvision(torch):
    if "torchvision" in sys.modules:
        return
    import numpy as np
    from PIL import Image

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    tf = types.ModuleType("torchvision.transforms.functional")
    tvm = types.ModuleType("torchvision.models")

    def to_tensor(pic):
        arr = np.asarray(pic, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr.transpose(2, 0, 1)).contiguous()

    def to_pil_image(t):
        arr = t.detach().cpu().numpy()
        if arr.ndim == 3:
            arr = arr.transpose(1, 2, 0)
        arr = np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8)
        return Image.fromarray(arr.squeeze())

    tf.to_tensor = to_tensor
    tf.to_pil_image = to_pil_image
    transforms.functional = tf
    tv.transforms = transforms
    tv.models = tvm
    for name, mod in [("torchvision", tv),
                      ("torchvision.transforms", transforms),
                      ("torchvision.transforms.functional", tf),
                      ("torchvision.models", tvm)]:
        sys.modules[name] = mod


def _stub_ftfy():
    if "ftfy" in sys.modules:
        return
    ftfy = types.ModuleType("ftfy")
    # identity is exact for already-well-formed unicode (all test inputs);
    # ftfy only repairs mojibake
    ftfy.fix_text = lambda s, **kw: s
    sys.modules["ftfy"] = ftfy


def _stub_diffdist():
    if "diffdist" in sys.modules:
        return
    dd = types.ModuleType("diffdist")
    fn = types.ModuleType("diffdist.functional")
    fn.all_gather = lambda gather_list, tensor, *a, **kw: gather_list
    dd.functional = fn
    sys.modules["diffdist"] = dd
    sys.modules["diffdist.functional"] = fn


def _synthetic_pkg(name, path):
    """Register a package whose __init__ body is never executed."""
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    mod.__package__ = name
    sys.modules[name] = mod


def ensure_loaded():
    """Idempotent: install stubs + synthetic reference packages."""
    global _loaded
    if _loaded:
        return
    import torch
    import torch.nn as nn

    _stub_timm(torch, nn)
    _stub_torchvision(torch)
    _stub_diffdist()
    _stub_ftfy()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _synthetic_pkg("core", REF_ROOT + "/core")
    _synthetic_pkg("core.model", REF_ROOT + "/core/model")
    _synthetic_pkg("core.model.backbone", REF_ROOT + "/core/model/backbone")
    _synthetic_pkg("core.data", REF_ROOT + "/core/data")
    # rapf.py imports core.data.dataloader (torchvision.datasets-heavy) but
    # the code paths we execute never touch it — register an empty shell
    dl = types.ModuleType("core.data.dataloader")
    sys.modules["core.data.dataloader"] = dl
    sys.modules["core.data"].dataloader = dl
    _loaded = True


def ref_module(dotted: str):
    """Import a reference module, e.g. ref_module('core.model.backbone.resnet')."""
    ensure_loaded()
    # some method modules do `from core.model.backbone import resnet18`:
    # mirror the resnet factories onto the synthetic (init-less) backbone
    # package without executing its heavyweight __init__
    # praka.py does `from core.model import Finetune`: mirror it onto the
    # synthetic core.model package without executing its __init__
    cm = sys.modules["core.model"]
    if dotted == "core.model.praka" and not hasattr(cm, "Finetune"):
        ft = importlib.import_module("core.model.finetune")
        cm.Finetune = ft.Finetune
    pkg = sys.modules["core.model.backbone"]
    if not hasattr(pkg, "resnet18"):
        rn = importlib.import_module("core.model.backbone.resnet")
        for name in getattr(rn, "__all__", []):
            setattr(pkg, name, getattr(rn, name))
        for name in ("resnet18", "resnet34", "resnet50"):
            setattr(pkg, name, getattr(rn, name))
    return importlib.import_module(dotted)
