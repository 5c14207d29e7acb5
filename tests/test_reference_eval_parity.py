"""Differential EVAL parity: my eval_logits / prediction path vs the
EXECUTING reference methods' ``inference`` (torch, CPU).

The loss-parity suite (test_reference_loss_parity.py) proves the TRAINING
math; several methods have a *different* program at eval — iCaRL's
nearest-class-mean readout, BiC's per-block bias correction, DualPrompt's
top-1 key match, DER's concatenated-extractor head, LUCIR's cosine head,
PRAKA's single-classifier readout, SD-LoRA's merged-direction forward,
RanPAC's projected ridge readout, RAPF's adapted-feature contrast, and
TRGP's task-aware multi-head with per-task trust-region installs. These
tests sync weights + eval-time state and assert prediction (and, where the
reference exposes them, logit/score) parity on the reference's own
inference code — every method whose inference differs from masked-argmax
is covered.
"""

from __future__ import annotations

import copy

import numpy as np
import pytest

pytestmark = pytest.mark.parity  # executing-torch tier (opt-in: -m parity)

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import _refload
import _refsync as S
from test_reference_loss_parity import (
    DEV, FEAT, INC, INIT, NUM_CLASS, REF_KW, TASKS, _prompt_harness,
    _vit_frozen, backbone_pytree, batch_of, full_pytree, head_pytree,
    install, my_method, randomize_torch,
)


@pytest.fixture(scope="module")
def ref_resnet():
    return _refload.ref_module("core.model.backbone.resnet")


# ---------------------------------------------------------------- iCaRL NCM


def test_icarl_ncm_eval(ref_resnet):
    """reference icarl.py NCM_classify: argmin of pairwise squared
    euclidean distance between eval-mode backbone features and the stored
    class means. Compares the score matrix (mine = -distance) and the
    predictions."""
    ref_icarl = _refload.ref_module("core.model.icarl")
    tm = ref_icarl.ICarl(ref_resnet.cifar_resnet20(), FEAT, NUM_CLASS,
                         **REF_KW)
    randomize_torch(tm.network, 2001)
    tm.cur_task_id = 1
    tm.prev_cls_num = INIT
    tm.accu_cls_num = INIT + INC
    rng = np.random.RandomState(2002)
    means = rng.randn(INIT + INC, FEAT).astype(np.float32)
    tm.class_means = torch.from_numpy(means)
    tm.network.eval()

    m, state = my_method("ICarl")
    params, mstate = full_pytree(tm.network.backbone, tm.network.classifier)
    my_means = np.zeros((NUM_CLASS, FEAT), np.float32)
    my_means[: INIT + INC] = means
    state1 = install(state, params, mstate, {
        "class_means": jnp.asarray(my_means),
        "nme_ready": jnp.ones((), jnp.float32),
        "mean_valid": jnp.asarray(
            (np.arange(NUM_CLASS) < INIT + INC).astype(np.float32)),
    })
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    tb, jb = batch_of(2003, 0, INIT + INC)
    t_pred, _ = tm.inference(tb)
    j_logits = np.asarray(m.eval_logits(state1, jb["x"], -1))
    j_pred = np.argmax(j_logits, axis=1)
    np.testing.assert_array_equal(j_pred, S.t2n(t_pred))
    # score parity: mine is -squared-distance on the seen columns
    with torch.no_grad():
        feats = tm.network.backbone(tb["image"])["features"]
        d = ((feats[:, None, :] - tm.class_means[None]) ** 2).sum(-1)
    np.testing.assert_allclose(
        j_logits[:, : INIT + INC], -S.t2n(d), rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------- BiC eval


def test_bic_bias_corrected_eval(ref_resnet):
    """reference bic.py inference: per-block bias layers applied to EVERY
    task block (the train branch is dead — ``train = False`` is hardcoded
    at the top of bias_forward), argmax over the seen prefix."""
    ref_bic = _refload.ref_module("core.model.bic")
    tm = ref_bic.bic(ref_resnet.cifar_resnet32_V2(), NUM_CLASS, **REF_KW)
    tm.model.classifier = torch.nn.Linear(64, NUM_CLASS)  # shipped-head repair
    randomize_torch(tm.model, 2101)
    g = torch.Generator().manual_seed(2102)
    with torch.no_grad():
        tm.model.classifier.weight.normal_(0, 0.1, generator=g)
        tm.model.classifier.bias.normal_(0, 0.1, generator=g)
        tm.bias_layers[0].alpha.fill_(1.3)
        tm.bias_layers[0].beta.fill_(0.2)
        tm.bias_layers[1].alpha.fill_(0.7)
        tm.bias_layers[1].beta.fill_(-0.1)
    tm.cur_task = 1
    tm.seen_cls = INIT + INC
    tm.model.eval()

    m, state = my_method("bic", {}, backbone="cifar_resnet32_V2", feat=64)
    blocks_p = S.sync_preact_resnet(tm.model.backbone)
    params = {"backbone": blocks_p["params"],
              "head": head_pytree(tm.model.classifier)}
    alphas = np.ones((TASKS,), np.float32)
    betas = np.zeros((TASKS,), np.float32)
    alphas[0], betas[0] = 1.3, 0.2
    alphas[1], betas[1] = 0.7, -0.1
    state1 = install(state, params, {"batch_stats": blocks_p["batch_stats"]},
                     {"alphas": jnp.asarray(alphas),
                      "betas": jnp.asarray(betas)})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    tb, jb = batch_of(2103, 0, INIT + INC)
    with torch.no_grad():
        p = tm.bias_forward(tm.model(tb["image"]), train=False)
    j_logits = np.asarray(m.eval_logits(state1, jb["x"], -1))
    np.testing.assert_allclose(
        j_logits[:, : INIT + INC], S.t2n(p)[:, : INIT + INC],
        rtol=1e-4, atol=1e-4)
    t_pred, _ = tm.inference(tb)
    np.testing.assert_array_equal(
        np.argmax(j_logits, axis=1), S.t2n(t_pred))


# ------------------------------------------------------- DualPrompt eval


def test_dualprompt_eval_keymatch():
    """reference dualprompt.py inference -> prompt.py eval branch: top-1
    cosine key match selects the e-prompt per sample (no task id at eval),
    logits from the prompted forward."""
    ref_dp = _refload.ref_module("core.model.dualprompt")
    zoo, m, state = _prompt_harness(
        "DualPrompt",
        {"e_prompt_length": 20, "g_prompt_length": 6, "pool_size": 10})
    kw = dict(num_class=NUM_CLASS, e_prompt_length=20, g_prompt_length=6,
              **{k: v for k, v in REF_KW.items() if k != "device"})
    tm = ref_dp.DualPrompt(zoo, 768, kw.pop("num_class"), device=DEV, **kw)
    tm.before_task(0, None, None, None)
    tm.after_task(0, None, None, None)
    tm.before_task(1, None, None, None)
    g = torch.Generator().manual_seed(2201)
    pr = tm.network.backbone.prompt
    with torch.no_grad():
        for name in ["g_p_0", "g_p_1", "e_p_2", "e_p_3", "e_p_4",
                     "e_k_2", "e_k_3", "e_k_4"]:
            getattr(pr, name).uniform_(0, 1, generator=g)
        tm.network.classifier.weight.normal_(0, 0.02, generator=g)
        tm.network.classifier.bias.zero_()
    tm.network.eval()

    prompt_params = {n: S.t2n(getattr(pr, n)) for n in
                     ["g_p_0", "g_p_1", "e_p_2", "e_p_3", "e_p_4",
                      "e_k_2", "e_k_3", "e_k_4"]}
    k = np.zeros((768, NUM_CLASS), np.float32)
    b = np.zeros((NUM_CLASS,), np.float32)
    k[:, : INIT + INC] = S.lin_k(tm.network.classifier.weight)
    params = {"head": {"Dense_0": {"kernel": jnp.asarray(k),
                                   "bias": jnp.asarray(b)}},
              "prompt": prompt_params}
    state1 = install(state, params, {}, {"frozen": _vit_frozen(zoo)})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    rng = np.random.RandomState(2202)
    x = rng.randn(4, 3, 224, 224).astype(np.float32) * 0.5
    y = rng.randint(0, INIT + INC, size=(4,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    with torch.no_grad():
        t_logits = tm.network(tb["image"], train=False)
    j_logits = np.asarray(
        m.eval_logits(state1, jnp.asarray(x.transpose(0, 2, 3, 1)), -1))
    np.testing.assert_allclose(
        j_logits[:, : INIT + INC], S.t2n(t_logits)[:, : INIT + INC],
        rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------- DER eval


def test_der_concat_eval(ref_resnet):
    """reference der.py inference: concatenated per-extractor features
    through the widened fc."""
    ref_der = _refload.ref_module("core.model.der")
    tm = ref_der.DER(ref_resnet.resnet18(
        args={"dataset": "cifar100", "init_cls_num": INIT, "inc_cls_num": INC}
    ), 512, NUM_CLASS, **REF_KW)
    tm.before_task(0, None, None, None)
    tm.before_task(1, None, None, None)
    randomize_torch(tm.convnets[0], 2301)
    randomize_torch(tm.convnets[1], 2302)
    g = torch.Generator().manual_seed(2303)
    with torch.no_grad():
        tm.fc.weight.normal_(0, 0.05, generator=g)
        tm.fc.bias.normal_(0, 0.05, generator=g)
    tm.convnets.eval()

    m, state = my_method("DER", backbone="resnet18", feat=512)
    m._active_count = 2
    D = 512
    nets = [S.sync_resnet(*S.blocks_torchvision(tm.convnets[i]))
            for i in range(2)]

    def stack(*trees):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)

    pads = [nets[0]] * (TASKS - 2)
    bb = stack(*(n["params"] for n in (nets + pads)))
    bs = stack(*(n["batch_stats"] for n in (nets + pads)))
    hk = np.zeros((TASKS * D, NUM_CLASS), np.float32)
    hb = np.zeros((NUM_CLASS,), np.float32)
    hk[: 2 * D, : INIT + INC] = S.lin_k(tm.fc.weight)
    hb[: INIT + INC] = S.t2n(tm.fc.bias)
    params = dict(state.params)
    params.update({"backbone": bb,
                   "head": {"Dense_0": {"kernel": jnp.asarray(hk),
                                        "bias": jnp.asarray(hb)}}})
    state1 = install(state, params, {"batch_stats": bs}, {
        "active": jnp.asarray((np.arange(TASKS) < 2).astype(np.float32))})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    tb, jb = batch_of(2304, 0, INIT + INC)
    t_pred, _ = tm.inference(tb)
    with torch.no_grad():
        feats = torch.cat([cn(tb["image"])["features"]
                           for cn in tm.convnets], 1)
        t_logits = tm.fc(feats)["logits"]
    j_logits = np.asarray(m.eval_logits(state1, jb["x"], -1))
    np.testing.assert_allclose(
        j_logits[:, : INIT + INC], S.t2n(t_logits)[:, : INIT + INC],
        rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.argmax(j_logits, 1), S.t2n(t_pred))


# ------------------------------------------------- MInfLoRA2 routed eval


def test_minflora_v2_routed_eval():
    """reference MInfLoRA2.py inference -> MultiMaskedLoRA eval branch
    (transformer.py:813-829): per layer, Gram the (B, N, C) attention input,
    project through every created task's saved_space, argmax the projection
    norms to pick the expert whose trust-region scaling rewrites stream 2's
    k/v; logits concat the created heads. Compares eval logits end-to-end
    with per-layer routing live on both sides."""
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_m = _refload.ref_module("core.model.MInfLoRA2")

    R, RS, RR = 4, 6, 10
    torch.manual_seed(45)
    net = ref_vit.ViTZoo(
        pretrained=False, attn_layer="MultiHeadAttention_MultiMaskedLoRA",
        block_layer="ResidualAttentionBiBlock",
        transformer_layer="Transformer_Proj", lora_rank=R)
    tm = ref_m.MInfLoRA2(
        net, DEV, init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
        lame=1.0, lamb=0.95, embd_dim=768, use_ca=False, dataset="cifar",
        eval_mat=False)
    tm._network.update_fc()
    tm._network.update_fc()
    tm._known_classes = INIT
    rng = np.random.RandomState(46)
    tr_spaces, route_spaces, scales = [], [], []
    with torch.no_grad():
        for mod in tm.attention_modules:
            for plist in mod.scale_param:
                for p in plist:
                    p.data = p.data.clone()  # split identity_matrix alias
            mod.init_param()
            mod.lora_A_k.weight.copy_(torch.from_numpy(
                rng.uniform(-0.2, 0.2, (R, 768)).astype(np.float32)))
            mod.lora_A_v.weight.copy_(torch.from_numpy(
                rng.uniform(-0.2, 0.2, (R, 768)).astype(np.float32)))
            mod.lora_B_k.weight.copy_(torch.from_numpy(
                rng.uniform(-0.05, 0.05, (768, R)).astype(np.float32)))
            mod.lora_B_v.weight.copy_(torch.from_numpy(
                rng.uniform(-0.05, 0.05, (768, R)).astype(np.float32)))
            trs, rts, scs = [], [], []
            for t in range(2):
                u, _ = np.linalg.qr(rng.randn(768, RS))
                trs.append(u.astype(np.float32))
                mod.enable_scale(task_id=t, space=[torch.from_numpy(trs[-1])])
                blk = (np.eye(RS) + 0.1 * rng.randn(RS, RS)).astype(np.float32)
                scs.append(blk)
                mod.scale_param[t][0].data[:RS, :RS] = torch.from_numpy(blk)
                sv = rng.randn(768, RR).astype(np.float32)
                rts.append(sv)
                mod.save_space(t, torch.from_numpy(sv))
            tr_spaces.append(trs)
            route_spaces.append(rts)
            scales.append(scs)
    net.eval()  # routing branch is eval-only

    m, state = my_method("MInfLoRA2", {"rank": R}, backbone="ViTZoo",
                         feat=768)
    frozen = jax.tree_util.tree_map(jnp.asarray, S.sync_vit(net.feat, 12))
    lora = {k: np.array(v) for k, v in state.params["lora"].items()}
    scale = np.array(state.params["scale"])
    tr_space = np.array(state.mvars["tr_space"])
    tr_mask = np.array(state.mvars["tr_mask"])
    route_space = np.array(state.mvars["route_space"])
    for li, mod in enumerate(tm.attention_modules):
        lora["A_k"][li] = S.t2n(mod.lora_A_k.weight)
        lora["A_v"][li] = S.t2n(mod.lora_A_v.weight)
        lora["B_k"][li] = S.t2n(mod.lora_B_k.weight)
        lora["B_v"][li] = S.t2n(mod.lora_B_v.weight)
        for t in range(2):
            tr_space[li, t, 0, :RS, :] = tr_spaces[li][t].T
            tr_mask[li, t, 0] = 1.0
            scale[li, t, 0][:RS, :RS] = scales[li][t]
            route_space[li, t, :, :RR] = route_spaces[li][t]
    hk = np.zeros((768, NUM_CLASS), np.float32)
    hb = np.zeros((NUM_CLASS,), np.float32)
    for t_, fc in enumerate(tm._network.classifier_pool):
        lo = 0 if t_ == 0 else INIT + (t_ - 1) * INC
        hk[:, lo: lo + fc.out_features] = S.lin_k(fc.weight)
        hb[lo: lo + fc.out_features] = S.t2n(fc.bias)
    params = {
        "head": {"Dense_0": {"kernel": jnp.asarray(hk), "bias": jnp.asarray(hb)}},
        "lora": {k: jnp.asarray(v) for k, v in lora.items()},
        "scale": jnp.asarray(scale),
    }
    T = TASKS
    state1 = install(state, params, {}, {
        "frozen": frozen,
        "tr_space": jnp.asarray(tr_space),
        "tr_mask": jnp.asarray(tr_mask),
        "route_space": jnp.asarray(route_space),
        "route_mask": jnp.asarray((np.arange(T) < 2).astype(np.float32)),
        "cur_expert": jnp.asarray(1, jnp.int32),
    })
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    x = (rng.randn(4, 3, 224, 224) * 0.5).astype(np.float32)
    with torch.no_grad():
        t_logits = tm._network(torch.from_numpy(x), expert_id=0,
                               inference=True)
    j_logits = np.asarray(m.eval_logits(
        state1, jnp.asarray(x.transpose(0, 2, 3, 1)), -1))
    np.testing.assert_allclose(
        j_logits[:, : INIT + INC], S.t2n(t_logits), rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------- L2P eval


def test_l2p_eval():
    """reference l2p.py inference: the un-masked prompted forward at
    train=False (frozen query pass + batchwise-majority top-k selection is
    live at eval too, prompt.py:369-406); seen-prefix argmax."""
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_l2p = _refload.ref_module("core.model.l2p")
    ref_tf = _refload.ref_module("core.model.backbone.transformer")  # noqa

    torch.manual_seed(7)  # same margin-safe seed as the loss test
    zoo = ref_vit.ViTZoo(pretrained=False)
    kw = dict(num_class=NUM_CLASS, feat_dim=768, prompt_length=5,
              pool_size=10, top_k=5, pull_constraint_coeff=0.1,
              **{k: v for k, v in REF_KW.items() if k != "device"})
    tm = ref_l2p.L2P(zoo, DEV, **kw)
    g = torch.Generator().manual_seed(2401)
    with torch.no_grad():
        tm.network.backbone.prompt.prompt.uniform_(0, 1, generator=g)
        tm.network.backbone.prompt.prompt_key.uniform_(0, 1, generator=g)
        tm.network.classifier.weight.normal_(0, 0.02, generator=g)
        tm.network.classifier.bias.zero_()
    tm.cur_task_id = 1
    tm._known_classes = INIT
    tm.network.eval()

    m, state = my_method(
        "L2P",
        {"prompt_length": 5, "pool_size": 10, "top_k": 5,
         "pull_constraint_coeff": 0.1},
        backbone="ViTZoo", feat=768)
    frozen = jax.tree_util.tree_map(
        jnp.asarray, S.sync_vit(tm.network.backbone.feat, 12))
    params = {
        "head": {"Dense_0": {
            "kernel": S.lin_k(tm.network.classifier.weight),
            "bias": S.t2n(tm.network.classifier.bias)}},
        "prompt": {
            "prompt": S.t2n(tm.network.backbone.prompt.prompt)[0],
            "key": S.t2n(tm.network.backbone.prompt.prompt_key)},
    }
    state1 = install(state, params, {}, {"frozen": frozen})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    rng = np.random.RandomState(2402)
    x = rng.randn(4, 3, 224, 224).astype(np.float32) * 0.5
    tb = {"image": torch.from_numpy(x)}
    with torch.no_grad():
        t_logits, _ = tm.network(tb["image"], train=False)
    j_logits = np.asarray(m.eval_logits(
        state1, jnp.asarray(x.transpose(0, 2, 3, 1)), -1))
    np.testing.assert_allclose(
        j_logits[:, : INIT + INC], S.t2n(t_logits)[:, : INIT + INC],
        rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------- LUCIR


def test_lucir_cosine_eval(ref_resnet):
    """reference lucir.py:219-227 inference: plain argmax over the
    sigma-scaled SplitCosineLinear cosine logits (resnet.py:443-463) on
    eval-mode features — the readout trained through the hook-captured
    less-forget machinery. Compares logits and predictions."""
    ref_lucir = _refload.ref_module("core.model.lucir")
    kw = dict(K=2, lw_mr=1.0, dist=0.5, lamda=5.0)
    tm = ref_lucir.LUCIR(ref_resnet.cifar_resnet20(), FEAT, NUM_CLASS,
                         **kw, **REF_KW)
    randomize_torch(tm.network, 2501)
    g = torch.Generator().manual_seed(2502)
    new_fc = ref_resnet.SplitCosineLinear(FEAT, INIT, INC)
    with torch.no_grad():
        new_fc.fc1.weight.normal_(0, 0.1, generator=g)
        new_fc.fc2.weight.normal_(0, 0.1, generator=g)
        new_fc.sigma.fill_(2.9)
    tm.network.classifier = new_fc
    tm.task_idx = 1
    tm.network.eval()

    m, state = my_method("LUCIR", kw)
    bp, bs = backbone_pytree(tm.network.backbone)
    k = np.zeros((FEAT, NUM_CLASS), np.float32)
    k[:, :INIT] = S.lin_k(new_fc.fc1.weight)
    k[:, INIT:INIT + INC] = S.lin_k(new_fc.fc2.weight)
    params = {"backbone": bp,
              "head": {"kernel": jnp.asarray(k),
                       "sigma": jnp.asarray(2.9, np.float32)}}
    state1 = install(state, params, {"batch_stats": bs})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    tb, jb = batch_of(2503, 0, INIT + INC)
    t_pred, _ = tm.inference(tb)
    with torch.no_grad():
        t_logits = tm.network(tb["image"])
    j_logits = np.asarray(m.eval_logits(state1, jb["x"], -1))
    np.testing.assert_allclose(
        j_logits[:, : INIT + INC], S.t2n(t_logits), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.argmax(j_logits, axis=1), S.t2n(t_pred))


# ---------------------------------------------------------------- PRAKA


def test_praka_single_head_eval(ref_resnet):
    """reference praka.py:156-177 inference: argmax of the SINGLE
    classifier (praka.py:36-43) on eval-mode features — NOT the joint
    4x-rotation head the training loss uses. Compares logits and preds."""
    from test_reference_loss_parity import _praka_pair

    _, tm, m, state, params, mstate = _praka_pair(ref_resnet, task1=True)
    tm.task_idx = 1
    tm.model.eval()
    state1 = install(state, params, mstate)
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    tb, jb = batch_of(2603, 0, INIT + INC)
    t_pred, _ = tm.inference(tb)
    with torch.no_grad():
        t_logits = tm.model(tb["image"])
    j_logits = np.asarray(m.eval_logits(state1, jb["x"], -1))
    np.testing.assert_allclose(
        j_logits[:, : INIT + INC], S.t2n(t_logits), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.argmax(j_logits, axis=1), S.t2n(t_pred))


# ---------------------------------------------------------------- SD-LoRA


def test_sdlora_merged_direction_eval():
    """reference sd_lora.py:96-106 inference through
    MultiHeadAttention_SDLoRA (transformer.py:313-357): every PAST task's
    LoRA applied as a normalized direction (B A)/(|B||A|) scaled by
    (mag + assimilated mag), the current task's at raw scale — the merged
    readout after the lstsq assimilation. Compares logits and preds."""
    ref_vit = _refload.ref_module("core.model.backbone.vit")
    ref_sd = _refload.ref_module("core.model.sd_lora")

    R = 4
    torch.manual_seed(2701)
    net = ref_vit.ViTZoo(pretrained=False,
                         attn_layer="MultiHeadAttention_SDLoRA", lora_rank=R)
    tm = ref_sd.SD_LoRA(
        net, DEV, init_cls_num=INIT, inc_cls_num=INC, task_num=TASKS,
        init_mag=1.0, rank_reduction=[False, 0, 0, 0, 0],
        knowledge_dist=[False, 0.0], embd_dim=768)
    tm.before_task(0, None, None, None)
    tm.after_task(0, None, None, None)
    tm.before_task(1, None, None, None)

    g = torch.Generator().manual_seed(2702)
    with torch.no_grad():
        for mod in tm.attention_modules:
            for t in range(2):
                for lin in (mod.lora_A_q_list[t], mod.lora_B_q_list[t],
                            mod.lora_A_v_list[t], mod.lora_B_v_list[t]):
                    lin.weight.uniform_(-0.05, 0.05, generator=g)
            mod.assimilated_mag_lora_q[0] += 0.3
            mod.assimilated_mag_lora_v[0] -= 0.2
        tm.attention_modules[0].mag_lora[0].fill_(1.2)
        tm.attention_modules[0].mag_lora[1].fill_(0.8)
        tm._network.classifier.weight.normal_(0, 0.1, generator=g)
        tm._network.classifier.bias.normal_(0, 0.1, generator=g)
    tm._known_classes = INIT
    net.eval()

    m, state = my_method("SD_LoRA", {"init_mag": 1.0, "rank": R,
                                     "embd_dim": 768},
                         backbone="ViTZoo", feat=768)
    frozen = jax.tree_util.tree_map(jnp.asarray, S.sync_vit(net.feat, 12))
    L, T = 12, TASKS
    lora = {k: np.zeros(np.asarray(v).shape, np.float32)
            for k, v in state.params["lora"].items()}
    assim_q = np.zeros((L, T), np.float32)
    assim_v = np.zeros((L, T), np.float32)
    mag = np.zeros((L, T), np.float32)
    for li, mod in enumerate(tm.attention_modules):
        for t in range(2):
            lora["A_q"][li, t] = S.t2n(mod.lora_A_q_list[t].weight)
            lora["B_q"][li, t] = S.t2n(mod.lora_B_q_list[t].weight)
            lora["A_v"][li, t] = S.t2n(mod.lora_A_v_list[t].weight)
            lora["B_v"][li, t] = S.t2n(mod.lora_B_v_list[t].weight)
            mag[li, t] = float(mod.mag_lora[t])
        assim_q[li, 0] = float(mod.assimilated_mag_lora_q[0])
        assim_v[li, 0] = float(mod.assimilated_mag_lora_v[0])
    kern = np.zeros((768, NUM_CLASS), np.float32)
    bias = np.zeros((NUM_CLASS,), np.float32)
    w = tm._network.classifier
    kern[:, :INIT + INC] = S.lin_k(w.weight)
    bias[:INIT + INC] = S.t2n(w.bias)
    params = {
        "head": {"Dense_0": {"kernel": jnp.asarray(kern),
                             "bias": jnp.asarray(bias)}},
        "lora": {k: jnp.asarray(v) for k, v in lora.items()},
        "mag": jnp.asarray(mag),
    }
    active = (np.arange(T) < 2).astype(np.float32)
    onehot = (np.arange(T) == 1).astype(np.float32)
    state1 = install(state, params, {},
                     {"frozen": frozen, "active": jnp.asarray(active),
                      "train_onehot": jnp.asarray(onehot),
                      "assim_q": jnp.asarray(assim_q),
                      "assim_v": jnp.asarray(assim_v)})
    state1 = m.start_task(state1, 1, INIT, INIT + INC)

    rng = np.random.RandomState(2703)
    x = rng.randn(3, 3, 224, 224).astype(np.float32) * 0.5
    y = rng.randint(0, INIT + INC, size=(3,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    t_pred, _ = tm.inference(tb)
    with torch.no_grad():
        t_logits = tm._network(tb["image"], inference=True)
    j_logits = np.asarray(m.eval_logits(
        state1, jnp.asarray(x.transpose(0, 2, 3, 1)), -1))
    np.testing.assert_allclose(
        j_logits[:, : INIT + INC], S.t2n(t_logits), rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.argmax(j_logits, axis=1), S.t2n(t_pred))


# ---------------------------------------------------------------- RanPAC


def test_ranpac_projected_ridge_eval():
    """reference ranpac.py:201-212 inference: the CosineLinear RP branch
    (ranpac.py:49-60) — relu(feats @ W_rand) @ Wo.T, sigma=1 — with Wo
    solved by the reference's own update_rp_classifier (:231-267). Both
    sides run their full after-task solve on identical features, then the
    readout; compares logits and predictions."""
    ref_rp = _refload.ref_module("core.model.ranpac")
    D, M, n = 64, 50, 40
    rng = np.random.RandomState(2801)
    feats = rng.randn(n, D).astype(np.float32)
    labels = rng.randint(0, INIT + INC, size=(n,)).astype(np.int64)
    W = rng.randn(D, M).astype(np.float32)

    class _Clf:
        use_RP = False
        W_rand = None
        weight = torch.zeros(INIT + INC, M)

    class _Net:
        classifier = _Clf()

        def eval(self):
            pass

        def get_feature(self, x):
            return x

    class _DS:
        trfms = None

    class _Loader:
        dataset = _DS()

        def __iter__(self):
            yield {"image": torch.from_numpy(feats),
                   "label": torch.from_numpy(labels)}

    stub = type("Stub", (), {})()
    stub._network = _Net()
    stub.W_rand = torch.from_numpy(W)
    stub.device = DEV
    stub.M = M
    stub._classes_seen_so_far = INIT + INC
    stub.Q = torch.zeros(M, INIT + INC)
    stub.G = torch.zeros(M, M)
    ref_rp.RanPAC.update_rp_classifier(stub, _Loader(), None)

    # the REAL reference readout module with the solved weights
    clf = ref_rp.CosineLinear(D, INIT + INC)
    clf.use_RP = True
    clf.W_rand = torch.from_numpy(W)
    clf.weight.data = stub._network.classifier.weight.data.clone()
    with torch.no_grad():
        clf.sigma.fill_(1.0)

    te_feats = rng.randn(6, D).astype(np.float32)
    with torch.no_grad():
        t_logits = clf(torch.from_numpy(te_feats))
    t_pred = torch.argmax(t_logits, dim=1)

    # mine: same every-5th-position holdout reorder as the ridge-solve test
    n_fit = int(n * 0.8)
    fit_idx, ho_idx = list(range(n_fit)), list(range(n_fit, n))
    order = []
    fi, hi = iter(fit_idx), iter(ho_idx)
    for p in range(n):
        order.append(next(hi) if p % 5 == 0 else next(fi))
    order = np.asarray(order)

    m, state = my_method("RanPAC", {"M": M})
    mvars = dict(state.mvars)
    mvars["W_rand"] = jnp.asarray(W)
    state = state.replace(mvars=mvars)
    state = m.start_task(state, 1, INIT, INIT + INC)
    imgs = np.zeros((n, 32, 32, 3), np.float32)
    imgs.reshape(n, -1)[:, :D] = feats[order]
    m.augment = lambda rng_, images, train=True: images
    m.apply_backbone = lambda p, ms, x, train: (
        {"features": x.reshape(x.shape[0], -1)[:, :D]}, ms)

    class _TaskData:
        def __len__(self):
            return n

    _TaskData.images = imgs
    _TaskData.labels = labels[order]

    state = m.after_task(state, 1, _TaskData())
    te_imgs = np.zeros((6, 32, 32, 3), np.float32)
    te_imgs.reshape(6, -1)[:, :D] = te_feats
    j_logits = np.asarray(m.eval_logits(state, jnp.asarray(te_imgs), -1))
    np.testing.assert_allclose(
        j_logits[:, : INIT + INC], S.t2n(t_logits), rtol=2e-3, atol=2e-4)
    np.testing.assert_array_equal(np.argmax(j_logits, axis=1), S.t2n(t_pred))


# ---------------------------------------------------------------- RAPF


def test_rapf_adapter_eval():
    """reference rapf.py:365-377 inference: softmax over
    logit_scale * normalize(adapter(image_feats)) @ normalize(text_feats).T
    against the ACCUMULATED class-name text features (rapf.py:126-167,
    prompt=False path). Compares probabilities and predictions."""
    from test_reference_loss_parity import _rapf_pair

    _, net, tm, m, state, all_toks, rng = _rapf_pair()
    tm.task_id = 1
    tm.model.text_tokens = torch.from_numpy(all_toks[:INIT + INC])
    tm.model.hard_pairs = None
    state = m.start_task(state, 1, INIT, INIT + INC)

    x = (rng.randn(4, 3, 32, 32) * 0.5).astype(np.float16).astype(np.float32)
    y = rng.randint(0, INIT + INC, size=(4,)).astype(np.int64)
    tb = {"image": torch.from_numpy(x), "label": torch.from_numpy(y)}
    t_probs, _ = tm.inference(tb)
    j_logits = np.asarray(m.eval_logits(
        state, jnp.asarray(x.transpose(0, 2, 3, 1)), -1))
    j_probs = np.asarray(jax.nn.softmax(jnp.asarray(j_logits), axis=-1))
    np.testing.assert_allclose(
        j_probs[:, : INIT + INC], S.t2n(t_probs), rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(
        np.argmax(j_probs, axis=1), np.argmax(S.t2n(t_probs), axis=1))


# ---------------------------------------------------------------- TRGP


def test_trgp_task_aware_eval():
    """reference trgp.py:170-252 task-aware inference (AlexNet branch):
    per-task trust-region space + trained scale Q installed into every
    layer (alexnet.py:34-56 W <- W + W U (Q-I) U^T), the task's own head
    read out with a bias_classes offset. Task 0 has no trust regions
    (plain weights); task 1 carries one non-trivial (space, Q) per layer.
    Compares task-slice logits and offset predictions for both task ids."""
    from libcontinual_tpu.models.alexnet import CONV_SPECS, LAYER_IN_FLAT

    ref_trgp = _refload.ref_module("core.model.trgp")
    ref_alex = _refload.ref_module("core.model.backbone.alexnet")
    torch.manual_seed(2901)
    bb = ref_alex.AlexNet_TRGP()
    g = torch.Generator().manual_seed(2902)
    with torch.no_grad():
        for p in bb.parameters():
            p.uniform_(-0.1, 0.1, generator=g)
    tm = ref_trgp.TRGP(bb, DEV, init_cls_num=INIT, inc_cls_num=INC,
                       task_num=TASKS, label_smoothing=0.1)
    with torch.no_grad():
        for cl in tm.network.classifiers:
            cl.weight.normal_(0, 0.1, generator=g)
    tm.cur_task = 1
    tm._known_classes = INIT
    tm.network.eval()

    rng = np.random.RandomState(2903)
    r_space = 3

    def perm_conv(U, li):
        if li == 4:
            return U
        if li == 3:
            return U.reshape(256, 2, 2, -1).transpose(1, 2, 0, 3).reshape(
                1024, -1)
        c, k = CONV_SPECS[li]["in_ch"], CONV_SPECS[li]["kernel"]
        return U.reshape(c, k, k, -1).transpose(1, 2, 0, 3).reshape(
            k * k * c, -1)

    spaces, scales = [], []
    for li, d in enumerate(LAYER_IN_FLAT):
        q, _ = np.linalg.qr(rng.randn(d, r_space))
        spaces.append(np.ascontiguousarray(q, np.float32))
        scales.append((np.eye(r_space) + 0.1 * rng.randn(r_space, r_space))
                      .astype(np.float32))

    # reference per-task storage, as after_task snapshots it (trgp.py:320-327):
    # task 0 trained without trust regions; task 1 with one (space, Q) each.
    # The stored Q is FULL identity-shaped with the trained block top-left
    # (enable_scale builds Parameter(identity); training only moves the
    # cropped [r, r] block the forward reads).
    for i, module in enumerate(tm.layers):
        tm.all_space[0][i] = []
        tm.scale_param_each_tasks_each_layers[0][i] = []
        tm.all_space[1][i] = [torch.from_numpy(spaces[i])]
        full_q = np.eye(LAYER_IN_FLAT[i], dtype=np.float32)
        full_q[:r_space, :r_space] = scales[i]
        tm.scale_param_each_tasks_each_layers[1][i] = [torch.from_numpy(full_q)]

    m, state = my_method("TRGP", {"label_smoothing": 0.1},
                         backbone="AlexNet_TRGP", feat=2048)
    bp = {}
    for i, conv in enumerate((bb.conv1, bb.conv2, bb.conv3)):
        bp[f"conv{i}_kernel"] = S.conv_k(conv.weight)
    bp["fc3_kernel"] = perm_conv(S.lin_k(bb.fc1.weight), 3)
    bp["fc4_kernel"] = S.lin_k(bb.fc2.weight)
    for i, bn in enumerate((bb.bn1, bb.bn2, bb.bn3, bb.bn4, bb.bn5)):
        bp[f"bn{i}"] = {"scale": S.t2n(bn.weight), "bias": S.t2n(bn.bias)}
    head_k = np.zeros((2048, NUM_CLASS), np.float32)
    head_k[:, :INIT] = S.lin_k(tm.network.classifiers[0].weight)
    head_k[:, INIT:INIT + INC] = S.lin_k(tm.network.classifiers[1].weight)
    params = {
        "backbone": jax.tree_util.tree_map(jnp.asarray, bp),
        "head": {"Dense_0": {"kernel": jnp.asarray(head_k),
                             "bias": jnp.zeros((NUM_CLASS,), jnp.float32)}},
        "tr_scale": state.params["tr_scale"],
    }
    R = m.R_CAP
    for li in range(5):
        Up = perm_conv(spaces[li], li)
        blk = np.zeros((2, LAYER_IN_FLAT[li], R), np.float32)
        blk[0, :, :r_space] = Up
        state.mvars["tr_space"][li] = (
            state.mvars["tr_space"][li].at[1].set(jnp.asarray(blk)))
        Q = np.broadcast_to(np.eye(R, dtype=np.float32), (2, R, R)).copy()
        Q[0, :r_space, :r_space] = scales[li]
        params["tr_scale"][li] = params["tr_scale"][li].at[1].set(
            jnp.asarray(Q))
    state = install(state, params, {},
                    {"tr_space": state.mvars["tr_space"]})
    state = m.start_task(state, 1, INIT, INIT + INC)

    tb, jb = batch_of(2904, 0, INIT + INC)
    for t, lo, width in ((0, 0, INIT), (1, INIT, INC)):
        t_pred, _ = tm.inference(tb, task_id=t)
        # the reference's per-task raw logits (inference returns preds only)
        for i, module in enumerate(tm.layers):
            module.space = tm.all_space[t][i]
            module.scale_param = torch.nn.ParameterList(
                [torch.nn.Parameter(sp)
                 for sp in tm.scale_param_each_tasks_each_layers[t][i]])
        with torch.no_grad():
            t_logits = tm.network(tb["image"])[t]
        j_logits = np.asarray(m.eval_logits(state, jb["x"], t))
        np.testing.assert_allclose(
            j_logits[:, lo:lo + width], S.t2n(t_logits),
            rtol=2e-4, atol=2e-4, err_msg=f"TRGP task-{t} eval logits")
        np.testing.assert_array_equal(
            np.argmax(j_logits, axis=1), S.t2n(t_pred),
            err_msg=f"TRGP task-{t} eval preds")
