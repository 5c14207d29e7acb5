"""torch->flax weight synchronization for differential parity tests.

Copies a reference (PyTorch) model's parameters into the matching
libcontinual_tpu Flax variable pytree so both sides compute from identical
weights. Conv kernels transpose OIHW -> HWIO; BatchNorm maps
weight/bias/running_mean/running_var -> scale/bias/mean/var.
"""

from __future__ import annotations

import numpy as np


def t2n(t):
    # np.array (copy!) — t.numpy() returns a VIEW of torch storage, and
    # jnp.asarray on the CPU backend can alias that memory zero-copy.
    # Without the copy, a later torch optimizer.step() mutates the "synced"
    # jax params in place, silently corrupting any interleaved lockstep.
    return np.array(t.detach().cpu().numpy())


def conv_k(t):  # OIHW -> HWIO
    return np.transpose(t2n(t), (2, 3, 1, 0))


def lin_k(t):  # torch Linear weight (out,in) -> flax kernel (in,out)
    return t2n(t).T


def bn_vars(bn):
    params = {"scale": t2n(bn.weight), "bias": t2n(bn.bias)}
    stats = {"mean": t2n(bn.running_mean), "var": t2n(bn.running_var)}
    return params, stats


def sync_resnet(torch_blocks, stem_conv, stem_bn):
    """Build flax {params, batch_stats} for models.resnet.ResNet/CifarResNet.

    torch_blocks: ordered list of dicts with keys conv0,bn0,conv1,bn1 and
    optional down_conv,down_bn (torch modules).
    """
    params, stats = {}, {}
    params["conv_stem"] = {"kernel": conv_k(stem_conv.weight)}
    params["bn_stem"], stats["bn_stem"] = bn_vars(stem_bn)
    for i, b in enumerate(torch_blocks):
        name = f"BasicBlock_{i}"
        p = {
            "Conv_0": {"kernel": conv_k(b["conv0"].weight)},
            "Conv_1": {"kernel": conv_k(b["conv1"].weight)},
        }
        s = {}
        p["BatchNorm_0"], s["BatchNorm_0"] = bn_vars(b["bn0"])
        p["BatchNorm_1"], s["BatchNorm_1"] = bn_vars(b["bn1"])
        if "down_conv" in b:
            p["downsample"] = {"kernel": conv_k(b["down_conv"].weight)}
            if "down_bn" in b and b["down_bn"] is not None:
                p["downsample_bn"], s["downsample_bn"] = bn_vars(b["down_bn"])
        params[name] = p
        stats[name] = s
    return {"params": params, "batch_stats": stats}


def ln_vars(ln):
    return {"scale": t2n(ln.weight), "bias": t2n(ln.bias)}


def sync_vit_block(tb):
    """Flax params for models.vit.ViTBlock from reference
    ResidualAttentionBlock (transformer.py:1276-1336)."""
    return {
        "ln_1": ln_vars(tb.ln_1),
        "ln_2": ln_vars(tb.ln_2),
        "attn": {
            "qkv": {"kernel": lin_k(tb.attn.qkv.weight),
                    "bias": t2n(tb.attn.qkv.bias)},
            "proj": {"kernel": lin_k(tb.attn.proj.weight),
                     "bias": t2n(tb.attn.proj.bias)},
        },
        "mlp": {
            "fc1": {"kernel": lin_k(tb.mlp.fc1.weight),
                    "bias": t2n(tb.mlp.fc1.bias)},
            "fc2": {"kernel": lin_k(tb.mlp.fc2.weight),
                    "bias": t2n(tb.mlp.fc2.bias)},
        },
    }


def sync_vit(tm, depth):
    """Flax params for models.vit.VisionTransformer from reference
    VisionTransformer (transformer.py:2141-2300)."""
    params = {
        "patch_embed": {"kernel": conv_k(tm.patch_embed.proj.weight),
                        "bias": t2n(tm.patch_embed.proj.bias)},
        "cls_token": t2n(tm.cls_token),
        "pos_embed": t2n(tm.pos_embed),
        "norm": ln_vars(tm.norm),
    }
    for i in range(depth):
        params[f"block_{i}"] = sync_vit_block(tm.transformer.blocks[i])
    return params


def sync_inflora_vit(tm, depth=12):
    """Flax params for models.vit.VisionTransformer from reference
    vit_inflora.ViT_lora_co (timm naming: blocks.N.norm1/attn/mlp,
    SiNet.py:7-33) — LoRA factors excluded (installed as stacked arrays)."""
    params = {
        "patch_embed": {"kernel": conv_k(tm.patch_embed.proj.weight),
                        "bias": t2n(tm.patch_embed.proj.bias)},
        "cls_token": t2n(tm.cls_token),
        "pos_embed": t2n(tm.pos_embed),
        "norm": ln_vars(tm.norm),
    }
    for i in range(depth):
        b = tm.blocks[i]
        params[f"block_{i}"] = {
            "ln_1": ln_vars(b.norm1),
            "ln_2": ln_vars(b.norm2),
            "attn": {
                "qkv": {"kernel": lin_k(b.attn.qkv.weight),
                        "bias": t2n(b.attn.qkv.bias)},
                "proj": {"kernel": lin_k(b.attn.proj.weight),
                         "bias": t2n(b.attn.proj.bias)},
            },
            "mlp": {
                "fc1": {"kernel": lin_k(b.mlp.fc1.weight),
                        "bias": t2n(b.mlp.fc1.bias)},
                "fc2": {"kernel": lin_k(b.mlp.fc2.weight),
                        "bias": t2n(b.mlp.fc2.bias)},
            },
        }
    return params


def sync_preact_resnet(model):
    """Flax vars for models.resnet.PreActCifarResNet from reference
    ResNet_BIC (resnet.py:622-688)."""
    params, stats = {}, {}
    params["conv_stem"] = {"kernel": conv_k(model.conv1.weight)}
    i = 0
    for stage in (model.layer1, model.layer2, model.layer3):
        for b in stage:
            name = f"PreActBasicBlock_{i}"
            p = {
                "Conv_0": {"kernel": conv_k(b.conv1.weight)},
                "Conv_1": {"kernel": conv_k(b.conv2.weight)},
            }
            s = {}
            p["BatchNorm_0"], s["BatchNorm_0"] = bn_vars(b.bn1)
            p["BatchNorm_1"], s["BatchNorm_1"] = bn_vars(b.bn2)
            if b.downsample is not None:
                p["downsample"] = {"kernel": conv_k(b.downsample[0].weight)}
            params[name] = p
            stats[name] = s
            i += 1
    params["bn_final"], stats["bn_final"] = bn_vars(model.bn)
    return {"params": params, "batch_stats": stats}


def blocks_torchvision(model):
    """Reference ResNet (resnet.py:101-246): conv1 Sequential stem, layer1-4."""
    out = []
    for layer in (model.layer1, model.layer2, model.layer3, model.layer4):
        for b in layer:
            d = {"conv0": b.conv1, "bn0": b.bn1, "conv1": b.conv2, "bn1": b.bn2}
            if b.downsample is not None:
                d["down_conv"], d["down_bn"] = b.downsample[0], b.downsample[1]
            out.append(d)
    return out, model.conv1[0], model.conv1[1]


def blocks_cifar(model):
    """Reference CifarResNet (resnet.py:324-415): conv_1_3x3/bn_1, stage_1-3."""
    out = []
    for stage in (model.stage_1, model.stage_2, model.stage_3):
        for b in stage:
            d = {"conv0": b.conv_a, "bn0": b.bn_a, "conv1": b.conv_b, "bn1": b.bn_b}
            if b.downsample is not None:
                d["down_conv"], d["down_bn"] = b.downsample[0], b.downsample[1]
            out.append(d)
    return out, model.conv_1_3x3, model.bn_1


def blocks_lucir(model):
    """Reference modified_ResNet (resnet.py:506-577): conv1/bn1, layer1-3."""
    out = []
    for stage in (model.layer1, model.layer2, model.layer3):
        for b in stage:
            d = {"conv0": b.conv1, "bn0": b.bn1, "conv1": b.conv2, "bn1": b.bn2}
            if b.downsample is not None:
                d["down_conv"], d["down_bn"] = b.downsample[0], b.downsample[1]
            out.append(d)
    return out, model.conv1, model.bn1


def blocks_aml(model):
    """Reference ResNet_AML (resnet.py:717-753): conv1/bn1, layer1-4,
    shortcut Sequential as downsample."""
    out = []
    for layer in (model.layer1, model.layer2, model.layer3, model.layer4):
        for b in layer:
            d = {"conv0": b.conv1, "bn0": b.bn1, "conv1": b.conv2, "bn1": b.bn2}
            if len(b.shortcut) > 0:
                d["down_conv"], d["down_bn"] = b.shortcut[0], b.shortcut[1]
            out.append(d)
    return out, model.conv1, model.bn1


# --------------------------------------------------------------- inverse sync
# flax -> torch writers, for the piecewise lockstep protocol: the torch
# reference is re-synced from the JAX trainer's captured epoch states, so
# every epoch is compared from a common start and fp chaos cannot accumulate
# across the run (measured amplification at CIFAR-resnet20 geometry is
# ~5-10x per momentum-SGD step — a whole-trajectory lockstep is impossible
# in f32 regardless of implementation correctness).


def inv_conv_k(a):  # HWIO -> OIHW
    return np.ascontiguousarray(np.transpose(np.asarray(a), (3, 2, 0, 1)))


def inv_lin_k(a):  # flax kernel (in,out) -> torch Linear weight (out,in)
    return np.ascontiguousarray(np.asarray(a).T)


def _ident(a):
    # np.array (copy) so torch.from_numpy never sees a read-only view
    return np.array(a)


def resnet_param_pairs(torch_blocks, stem_conv, stem_bn, linear=None):
    """(torch tensor, path into the full {backbone, head} params pytree,
    flax->torch transform) triples mirroring ``sync_resnet``. Used both to
    write params back into torch and to map optax trace (momentum) leaves
    onto torch SGD momentum buffers."""
    prs = [
        (stem_conv.weight, ("backbone", "conv_stem", "kernel"), inv_conv_k),
        (stem_bn.weight, ("backbone", "bn_stem", "scale"), _ident),
        (stem_bn.bias, ("backbone", "bn_stem", "bias"), _ident),
    ]
    for i, b in enumerate(torch_blocks):
        n = f"BasicBlock_{i}"
        prs += [
            (b["conv0"].weight, ("backbone", n, "Conv_0", "kernel"), inv_conv_k),
            (b["conv1"].weight, ("backbone", n, "Conv_1", "kernel"), inv_conv_k),
            (b["bn0"].weight, ("backbone", n, "BatchNorm_0", "scale"), _ident),
            (b["bn0"].bias, ("backbone", n, "BatchNorm_0", "bias"), _ident),
            (b["bn1"].weight, ("backbone", n, "BatchNorm_1", "scale"), _ident),
            (b["bn1"].bias, ("backbone", n, "BatchNorm_1", "bias"), _ident),
        ]
        if "down_conv" in b:
            prs.append(
                (b["down_conv"].weight, ("backbone", n, "downsample", "kernel"),
                 inv_conv_k))
            if b.get("down_bn") is not None:
                prs += [
                    (b["down_bn"].weight,
                     ("backbone", n, "downsample_bn", "scale"), _ident),
                    (b["down_bn"].bias,
                     ("backbone", n, "downsample_bn", "bias"), _ident),
                ]
    if linear is not None:
        prs += [
            (linear.weight, ("head", "Dense_0", "kernel"), inv_lin_k),
            (linear.bias, ("head", "Dense_0", "bias"), _ident),
        ]
    return prs


def resnet_stat_pairs(torch_blocks, stem_bn):
    """(torch running-stat buffer, path into batch_stats) pairs."""
    prs = [
        (stem_bn.running_mean, ("bn_stem", "mean")),
        (stem_bn.running_var, ("bn_stem", "var")),
    ]
    for i, b in enumerate(torch_blocks):
        n = f"BasicBlock_{i}"
        prs += [
            (b["bn0"].running_mean, (n, "BatchNorm_0", "mean")),
            (b["bn0"].running_var, (n, "BatchNorm_0", "var")),
            (b["bn1"].running_mean, (n, "BatchNorm_1", "mean")),
            (b["bn1"].running_var, (n, "BatchNorm_1", "var")),
        ]
        if b.get("down_bn") is not None:
            prs += [
                (b["down_bn"].running_mean, (n, "downsample_bn", "mean")),
                (b["down_bn"].running_var, (n, "downsample_bn", "var")),
            ]
    return prs


def tree_get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def write_param_pairs(pairs, tree):
    """Copy flax pytree values INTO the paired torch tensors (in place)."""
    import torch

    with torch.no_grad():
        for t, path, inv in pairs:
            t.copy_(torch.from_numpy(inv(np.asarray(tree_get(tree, path),
                                                    np.float32))))


def write_stat_pairs(pairs, stats_tree):
    import torch

    with torch.no_grad():
        for t, path in pairs:
            t.copy_(torch.from_numpy(
                np.ascontiguousarray(np.asarray(tree_get(stats_tree, path),
                                                np.float32))))


def write_momentum(pairs, trace_tree, optim):
    """Set torch SGD momentum buffers from an optax ``trace`` pytree (same
    structure as params). torch's buf and optax's trace follow the same
    recursion ``buf = mu*buf + (g + wd*p)`` so the leaves correspond 1:1."""
    import torch

    for t, path, inv in pairs:
        buf = torch.from_numpy(inv(np.asarray(tree_get(trace_tree, path),
                                              np.float32)))
        optim.state[t]["momentum_buffer"] = buf


# ------------------------------------------------------------- AlexNet_TRGP

ALEX_KSIZES = (4, 3, 2)
ALEX_CHANS = (3, 64, 128)


def alex_perms():
    """Flat-order permutations per projected AlexNet layer: torch flattens
    conv weights/acts as (C, kh, kw) and the conv3->fc1 input as (C, h, w);
    this framework uses (kh, kw, C) / (h, w, C). perm[torch_idx] = my_idx."""
    perms = []
    for k, c in zip(ALEX_KSIZES, ALEX_CHANS):
        p = np.empty(c * k * k, np.int64)
        for ci in range(c):
            for h in range(k):
                for w in range(k):
                    p[ci * k * k + h * k + w] = (h * k + w) * c + ci
        perms.append(p)
    p = np.empty(1024, np.int64)  # conv3 out: (256, 2, 2) vs (2, 2, 256)
    for ci in range(256):
        for h in range(2):
            for w in range(2):
                p[ci * 4 + h * 2 + w] = (h * 2 + w) * 256 + ci
    perms.append(p)
    perms.append(np.arange(2048, dtype=np.int64))  # fc2 input: features
    return perms


def sync_alexnet(tm_net):
    """torch AlexNet_TRGP -> my AlexNetTRGP flax params (fc1 rows permuted
    to the (h, w, C) flatten order)."""
    perms = alex_perms()
    p = {}
    for i, conv in enumerate([tm_net.conv1, tm_net.conv2, tm_net.conv3]):
        p[f"conv{i}_kernel"] = conv_k(conv.weight)
    for i, bn in enumerate([tm_net.bn1, tm_net.bn2, tm_net.bn3,
                            tm_net.bn4, tm_net.bn5]):
        p[f"bn{i}"] = {"scale": t2n(bn.weight), "bias": t2n(bn.bias)}
    fc1 = lin_k(tm_net.fc1.weight)  # (1024, 2048) torch-flat rows
    fc1_mine = np.empty_like(fc1)
    fc1_mine[perms[3]] = fc1
    p["fc3_kernel"] = fc1_mine
    p["fc4_kernel"] = lin_k(tm_net.fc2.weight)
    return p


def alexnet_param_pairs(tm_net, perms=None):
    """(torch tensor, path into my {backbone,...} pytree, flax->torch
    transform) triples for AlexNet_TRGP — the inverse of sync_alexnet,
    used by the GPM lockstep's piecewise resync."""
    perms = perms or alex_perms()

    def inv_fc3(a):  # my (h,w,C)-flat rows -> torch (C,h,w)-flat weight
        return np.ascontiguousarray(np.asarray(a)[perms[3]].T)

    prs = []
    for i, conv in enumerate([tm_net.conv1, tm_net.conv2, tm_net.conv3]):
        prs.append((conv.weight, ("backbone", f"conv{i}_kernel"), inv_conv_k))
    for i, bn in enumerate([tm_net.bn1, tm_net.bn2, tm_net.bn3,
                            tm_net.bn4, tm_net.bn5]):
        prs.append((bn.weight, ("backbone", f"bn{i}", "scale"), _ident))
        prs.append((bn.bias, ("backbone", f"bn{i}", "bias"), _ident))
    prs.append((tm_net.fc1.weight, ("backbone", "fc3_kernel"), inv_fc3))
    prs.append((tm_net.fc2.weight, ("backbone", "fc4_kernel"), inv_lin_k))
    return prs


def preact_param_pairs(model, linear=None):
    """(torch tensor, path, flax->torch transform) triples for the
    reference ResNet_BIC / my PreActCifarResNet (inverse of
    sync_preact_resnet), for the BiC lockstep's piecewise resync."""
    prs = [(model.conv1.weight, ("backbone", "conv_stem", "kernel"),
            inv_conv_k)]
    i = 0
    for stage in (model.layer1, model.layer2, model.layer3):
        for b in stage:
            n = f"PreActBasicBlock_{i}"
            prs += [
                (b.conv1.weight, ("backbone", n, "Conv_0", "kernel"), inv_conv_k),
                (b.conv2.weight, ("backbone", n, "Conv_1", "kernel"), inv_conv_k),
                (b.bn1.weight, ("backbone", n, "BatchNorm_0", "scale"), _ident),
                (b.bn1.bias, ("backbone", n, "BatchNorm_0", "bias"), _ident),
                (b.bn2.weight, ("backbone", n, "BatchNorm_1", "scale"), _ident),
                (b.bn2.bias, ("backbone", n, "BatchNorm_1", "bias"), _ident),
            ]
            if b.downsample is not None:
                prs.append((b.downsample[0].weight,
                            ("backbone", n, "downsample", "kernel"),
                            inv_conv_k))
            i += 1
    prs += [
        (model.bn.weight, ("backbone", "bn_final", "scale"), _ident),
        (model.bn.bias, ("backbone", "bn_final", "bias"), _ident),
    ]
    if linear is not None:
        prs += [
            (linear.weight, ("head", "Dense_0", "kernel"), inv_lin_k),
            (linear.bias, ("head", "Dense_0", "bias"), _ident),
        ]
    return prs


def preact_stat_pairs(model):
    """(torch running-stat buffer, path into batch_stats) pairs for
    ResNet_BIC / PreActCifarResNet."""
    prs = []
    i = 0
    for stage in (model.layer1, model.layer2, model.layer3):
        for b in stage:
            n = f"PreActBasicBlock_{i}"
            prs += [
                (b.bn1.running_mean, (n, "BatchNorm_0", "mean")),
                (b.bn1.running_var, (n, "BatchNorm_0", "var")),
                (b.bn2.running_mean, (n, "BatchNorm_1", "mean")),
                (b.bn2.running_var, (n, "BatchNorm_1", "var")),
            ]
            i += 1
    prs += [
        (model.bn.running_mean, ("bn_final", "mean")),
        (model.bn.running_var, ("bn_final", "var")),
    ]
    return prs
