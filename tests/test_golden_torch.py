"""Golden-parity battery against the installed torch / transformers.

Round-1 tests validated every op against math re-derived in-repo;
these tests instead transplant weights into *external* implementations
(HF ``BertModel``/``BertTokenizer``, ``torch.optim.SGD``, a torch
build of the d2 FrozenBN bottleneck conventions, and torch's
``grid_sample`` bilinear kernel) and assert numeric agreement. This is
the strongest reference-consistency evidence available without the
real COCO checkpoints (torchvision/pycocotools are not installed).

Reference call sites being mirrored:
- BERT forward: ovr/modeling/language/transf_models.py:5,11-15
- tokenizer:    transf_models.py:26-33 (HF bert-base-uncased, lowercase)
- SGD:          ovr/engine/solver.py:28-32 (torch.optim.SGD momentum/nesterov)
- ResNet/FrozenBN: d2 BottleneckBlock conventions (stride_in_1x1)
- ROIAlign:     detectron2 ROIAlign aligned=True (roi_emb_heads.py:182-187)
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from locov_tpu.utils.checkpoint import (convert_bert_state_dict,
                                        convert_d2_state_dict,
                                        flatten_params, unflatten_params)

torch.manual_seed(0)


# ===================================================================== BERT
def _small_bert_cfgs():
    from transformers import BertConfig as HFBertConfig
    from locov_tpu.models.bert import BertConfig
    kw = dict(vocab_size=120, hidden_size=32, num_hidden_layers=3,
              num_attention_heads=4, intermediate_size=64,
              max_position_embeddings=64, hidden_dropout_prob=0.0,
              attention_probs_dropout_prob=0.0)
    return HFBertConfig(**kw), BertConfig(**kw)


def test_bert_forward_matches_hf():
    """Our flax BertModel == HF BertModel after weight transplant via
    convert_bert_state_dict (the exact path a real bert-base-uncased
    checkpoint takes)."""
    from transformers import BertModel as HFBertModel
    from locov_tpu.models.bert import BertModel

    hf_cfg, our_cfg = _small_bert_cfgs()
    hf = HFBertModel(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    converted = convert_bert_state_dict(state)

    model = BertModel(our_cfg)
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 120, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    mask[1, 8:] = 0
    ids[1, 8:] = 0

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(mask))
    flat = flatten_params(params["params"])
    # full coverage: every live param must come from the HF checkpoint
    missing = [k for k in flat if k not in converted]
    assert not missing, f"no HF source for: {missing}"
    new_flat = {k: converted[k].astype(np.float32) for k in flat}
    params = {"params": unflatten_params(new_flat)}

    with jax.default_matmul_precision("highest"):
        ours = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    with torch.no_grad():
        theirs = hf(torch.from_numpy(ids.astype(np.int64)),
                    attention_mask=torch.from_numpy(
                        mask.astype(np.int64))).last_hidden_state.numpy()
    # padded positions still flow through HF's encoder; compare all
    np.testing.assert_allclose(np.asarray(ours), theirs,
                               atol=2e-5, rtol=1e-5)


def test_bert_pooler_and_lm_head_match_hf():
    """Pooler tanh-dense and the tied LM prediction head vs HF."""
    from transformers import BertForPreTraining
    from locov_tpu.models.bert import (BertLMHead, BertModel, BertPooler)

    hf_cfg, our_cfg = _small_bert_cfgs()
    hf = BertForPreTraining(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    converted = convert_bert_state_dict(state)

    rng = np.random.RandomState(1)
    ids = rng.randint(1, 120, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)

    model = BertModel(our_cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(mask))
    flat = flatten_params(params["params"])
    params = {"params": unflatten_params(
        {k: converted[k].astype(np.float32) for k in flat})}
    with jax.default_matmul_precision("highest"):
        hidden = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))

    # pooler
    pooler = BertPooler(our_cfg)
    pp = {"params": {"dense": {
        "kernel": converted["pooler/dense/kernel"].astype(np.float32),
        "bias": converted["pooler/dense/bias"].astype(np.float32)}}}
    with jax.default_matmul_precision("highest"):
        pooled = pooler.apply(pp, hidden)

    # LM head (HF names: cls.predictions.*; our converter strips "cls.")
    lm = BertLMHead(our_cfg)
    word = converted["embeddings/word_embeddings"].astype(np.float32)
    lp = {"params": {
        "transform": {
            "dense": {
                "kernel": state["cls.predictions.transform.dense.weight"
                                ].T.astype(np.float32),
                "bias": state["cls.predictions.transform.dense.bias"
                              ].astype(np.float32)},
            "norm": {
                "scale": state["cls.predictions.transform.LayerNorm.weight"
                               ].astype(np.float32),
                "bias": state["cls.predictions.transform.LayerNorm.bias"
                              ].astype(np.float32)}},
        "decoder_bias": state["cls.predictions.bias"].astype(np.float32),
    }}
    with jax.default_matmul_precision("highest"):
        logits = lm.apply(lp, hidden, jnp.asarray(word))

    with torch.no_grad():
        tids = torch.from_numpy(ids.astype(np.int64))
        tmask = torch.from_numpy(mask.astype(np.int64))
        hf_logits = hf(tids, attention_mask=tmask
                       ).prediction_logits.numpy()
        hf_pooled = hf.bert(tids, attention_mask=tmask
                            ).pooler_output.numpy()
    np.testing.assert_allclose(np.asarray(pooled), hf_pooled,
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               atol=3e-5, rtol=1e-5)


# ================================================================ tokenizer
_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "jump", "##s", "##ed", "over",
    "lazy", "dog", "a", "un", "##aff", "##able", "##wanted",
    "cafe", "naive", "resume", "angstrom",
    "12", "##34", "##5", "1", "2",
    "!", ",", ".", "?", "'", '"', "-", "(", ")",
    "我", "爱", "中", "文",
    "hello", "world", "run", "##ning", "##ly",
]

_CORPUS = [
    "The quick brown fox jumps over the lazy dog.",
    "unaffable, unwanted!! running quickly?",
    "café naïve résumé Ångström",     # accents
    "我爱 hello 中文 world",                         # CJK
    "12345 12 1 2",
    "  (hello)   'world' \"the\"  ",
    "zzzzqqqq unknownword",                                          # -> UNK
    "x" * 150,                                          # > max_chars_per_word
    "",                                                              # empty
    "hello\tworld\nthe\rdog",                                        # ws
    "the\x00dog�runs",                                          # control
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    p.write_text("\n".join(_VOCAB) + "\n", encoding="utf-8")
    return str(p)


def test_wordpiece_matches_hf_tokenizer(vocab_file):
    from transformers import BertTokenizer
    from locov_tpu.data.tokenization import WordPieceTokenizer

    hf = BertTokenizer(vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(vocab_file, lowercase=True)
    for text in _CORPUS:
        assert ours.tokenize(text) == hf.tokenize(text), repr(text)


def test_encode_matches_hf_tokenizer(vocab_file):
    """ids / attention_mask / special_tokens_mask vs HF's
    tokenizer(..., padding='max_length', truncation=True) — the exact
    surface the reference uses (transf_models.py:26-33)."""
    from transformers import BertTokenizer
    from locov_tpu.data.tokenization import WordPieceTokenizer

    L = 16
    hf = BertTokenizer(vocab_file, do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(vocab_file, lowercase=True)
    for text in _CORPUS:
        enc = hf(text, max_length=L, padding="max_length",
                 truncation=True, return_special_tokens_mask=True)
        ids, attn, special = ours.encode(text, L)
        assert ids.tolist() == enc["input_ids"], repr(text)
        assert attn.tolist() == enc["attention_mask"], repr(text)
        assert special.tolist() == enc["special_tokens_mask"], repr(text)


# ====================================================================== SGD
def test_sgd_update_sequence_matches_torch():
    """Our optax SGD (torch semantics: wd folded into grad, momentum
    buffer, nesterov lookahead) vs torch.optim.SGD over 8 steps with a
    multistep+warmup lr schedule applied identically to both."""
    from locov_tpu.config import get_cfg
    from locov_tpu.engine.solver import build_optimizer

    for nesterov in [False, True]:
        cfg = get_cfg()
        cfg.SOLVER.BASE_LR = 0.02
        cfg.SOLVER.MOMENTUM = 0.9
        cfg.SOLVER.NESTEROV = nesterov
        cfg.SOLVER.WEIGHT_DECAY = 1e-4
        cfg.SOLVER.WEIGHT_DECAY_NORM = 0.0
        cfg.SOLVER.BIAS_LR_FACTOR = 2.0
        cfg.SOLVER.WEIGHT_DECAY_BIAS = 5e-5
        cfg.SOLVER.STEPS = (5,)
        cfg.SOLVER.GAMMA = 0.1
        cfg.SOLVER.WARMUP_ITERS = 3
        cfg.SOLVER.WARMUP_FACTOR = 0.25
        cfg.SOLVER.WARMUP_METHOD = "linear"
        cfg.SOLVER.CLIP_GRADIENTS.ENABLED = False

        rng = np.random.RandomState(2)
        p0 = {"dense": {"kernel": rng.randn(6, 4).astype(np.float32),
                        "bias": rng.randn(4).astype(np.float32)},
              "conv1_norm": {"weight": rng.randn(4).astype(np.float32),
                             "bias": rng.randn(4).astype(np.float32)}}
        params = jax.tree.map(jnp.asarray, p0)
        tx, schedule = build_optimizer(cfg, params)
        state = tx.init(params)

        # torch mirror: groups replicate the reference's
        # get_default_optimizer_params assignment (solver.py:84-94 —
        # norm params get wd_norm, other biases get bias_lr_factor +
        # wd_bias); lr is set per-step from the same schedule
        tparams = {}
        for k1 in p0:
            for k2 in p0[k1]:
                tparams[f"{k1}/{k2}"] = torch.nn.Parameter(
                    torch.from_numpy(p0[k1][k2].copy()))
        groups = [
            {"params": [tparams["dense/kernel"]], "lr_factor": 1.0,
             "weight_decay": 1e-4},
            {"params": [tparams["dense/bias"]], "lr_factor": 2.0,
             "weight_decay": 5e-5},
            {"params": [tparams["conv1_norm/weight"]], "lr_factor": 1.0,
             "weight_decay": 0.0},
            {"params": [tparams["conv1_norm/bias"]], "lr_factor": 1.0,
             "weight_decay": 0.0},
        ]
        opt = torch.optim.SGD(
            [{"params": g["params"], "lr": 0.02 * g["lr_factor"],
              "weight_decay": g["weight_decay"]} for g in groups],
            lr=0.02, momentum=0.9, nesterov=nesterov)

        for step in range(8):
            grads = jax.tree.map(
                lambda p: jnp.asarray(
                    np.sin(np.arange(p.size, dtype=np.float32)
                           + step).reshape(p.shape)), params)
            lr = float(schedule(step))
            for g, spec in zip(opt.param_groups, groups):
                g["lr"] = lr * spec["lr_factor"]
            for name, tp in tparams.items():
                k1, k2 = name.split("/")
                tp.grad = torch.from_numpy(
                    np.asarray(grads[k1][k2]).copy())
            opt.step()
            updates, state = tx.update(grads, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)

        for k1 in p0:
            for k2 in p0[k1]:
                np.testing.assert_allclose(
                    np.asarray(params[k1][k2]),
                    tparams[f"{k1}/{k2}"].detach().numpy(),
                    atol=1e-6, rtol=1e-5,
                    err_msg=f"{k1}/{k2} nesterov={nesterov}")


# ============================================================ ResNet/FrozenBN
class _TorchFrozenBN(torch.nn.Module):
    """d2 FrozenBatchNorm2d: y = x * w/sqrt(var+eps) + (b - mean*scale)."""

    def __init__(self, n, eps=1e-5):
        super().__init__()
        self.register_buffer("weight", torch.randn(n))
        self.register_buffer("bias", torch.randn(n))
        self.register_buffer("running_mean", torch.randn(n) * 0.1)
        self.register_buffer("running_var", torch.rand(n) + 0.5)
        self.eps = eps

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        shift = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + shift[None, :, None, None]


class _TorchBottleneck(torch.nn.Module):
    """d2 BottleneckBlock with stride_in_1x1=True (Caffe convention)."""

    def __init__(self, cin, cmid, cout, stride, shortcut):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cmid, 1, stride, 0, bias=False)
        self.conv1_norm = _TorchFrozenBN(cmid)
        self.conv2 = torch.nn.Conv2d(cmid, cmid, 3, 1, 1, bias=False)
        self.conv2_norm = _TorchFrozenBN(cmid)
        self.conv3 = torch.nn.Conv2d(cmid, cout, 1, 1, 0, bias=False)
        self.conv3_norm = _TorchFrozenBN(cout)
        self.shortcut = None
        if shortcut:
            self.shortcut = torch.nn.Conv2d(cin, cout, 1, stride, 0,
                                            bias=False)
            self.shortcut_norm = _TorchFrozenBN(cout)

    def forward(self, x):
        out = torch.relu(self.conv1_norm(self.conv1(x)))
        out = torch.relu(self.conv2_norm(self.conv2(out)))
        out = self.conv3_norm(self.conv3(out))
        sc = self.shortcut_norm(self.shortcut(x)) if self.shortcut \
            else x
        return torch.relu(out + sc)


class _TorchC4Trunk(torch.nn.Module):
    """stem + res2 (2 blocks) + res3 (2 blocks), d2 conventions, small
    channels — enough to cover stride placement, shortcut, maxpool."""

    def __init__(self):
        super().__init__()
        self.stem_conv1 = torch.nn.Conv2d(3, 8, 7, 2, 3, bias=False)
        self.stem_norm = _TorchFrozenBN(8)
        self.res2 = torch.nn.ModuleList([
            _TorchBottleneck(8, 4, 16, 1, True),
            _TorchBottleneck(16, 4, 16, 1, False)])
        self.res3 = torch.nn.ModuleList([
            _TorchBottleneck(16, 8, 32, 2, True),
            _TorchBottleneck(32, 8, 32, 1, False)])

    def forward(self, x):
        x = torch.relu(self.stem_norm(self.stem_conv1(x)))
        x = torch.nn.functional.max_pool2d(x, 3, 2, 1)
        for b in self.res2:
            x = b(x)
        for b in self.res3:
            x = b(x)
        return x


def test_resnet_frozen_bn_stage_matches_torch():
    """Flax stem+res2+res3 vs the torch d2-convention build with the
    same weights, transplanted through convert_d2_state_dict — de-risks
    stride_in_1x1 placement, FrozenBN math, pad/maxpool conventions
    (SURVEY §7(f))."""
    from flax import linen as nn
    from locov_tpu.models.resnet import (BottleneckBlock, FrozenBatchNorm,
                                         ResNetStage, ResNetStem)

    tm = _TorchC4Trunk().eval()

    class FlaxTrunk(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = ResNetStem(out_channels=8, name="stem")(x)
            x = ResNetStage(num_blocks=2, bottleneck_channels=4,
                            out_channels=16, first_stride=1,
                            name="res2")(x)
            x = ResNetStage(num_blocks=2, bottleneck_channels=8,
                            out_channels=32, first_stride=2,
                            name="res3")(x)
            return x

    # torch state under d2 names -> our flat naming
    state = {}
    sd = tm.state_dict()
    state["backbone.stem.conv1.weight"] = sd["stem_conv1.weight"].numpy()
    for leaf in ["weight", "bias", "running_mean", "running_var"]:
        state[f"backbone.stem.conv1.norm.{leaf}"] = \
            sd[f"stem_norm.{leaf}"].numpy()
    for stage in ["res2", "res3"]:
        for b in range(2):
            pre = f"{stage}.{b}."
            for conv in ["conv1", "conv2", "conv3"]:
                state[f"backbone.{stage}.{b}.{conv}.weight"] = \
                    sd[pre + f"{conv}.weight"].numpy()
                for leaf in ["weight", "bias", "running_mean",
                             "running_var"]:
                    state[f"backbone.{stage}.{b}.{conv}.norm.{leaf}"] = \
                        sd[pre + f"{conv}_norm.{leaf}"].numpy()
            if b == 0:
                state[f"backbone.{stage}.0.shortcut.weight"] = \
                    sd[pre + "shortcut.weight"].numpy()
                for leaf in ["weight", "bias", "running_mean",
                             "running_var"]:
                    state[f"backbone.{stage}.0.shortcut.norm.{leaf}"] = \
                        sd[pre + f"shortcut_norm.{leaf}"].numpy()
    converted = {k[len("backbone/"):]: v for k, v in
                 convert_d2_state_dict(state).items()}

    model = FlaxTrunk()
    x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    flat = flatten_params(params["params"])
    missing = [k for k in flat if k not in converted]
    assert not missing, f"transplant gaps: {missing}"
    params = {"params": unflatten_params(
        {k: converted[k].astype(np.float32) for k in flat})}

    with jax.default_matmul_precision("highest"):
        ours = model.apply(params, jnp.asarray(x))  # NHWC
    with torch.no_grad():
        theirs = tm(torch.from_numpy(
            x.transpose(0, 3, 1, 2).copy())).numpy()  # NCHW
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), theirs,
        atol=1e-4, rtol=1e-4)


# ================================================================= ROIAlign
def _torch_roi_align_ref(feat, boxes, scale, pooled, ratio):
    """ROIAlignV2 (aligned=True) reference built on torch's own
    bilinear sampler: torchvision's border rule (outside [-1, dim] ->
    0, else clamp to [0, dim-1]) applied to explicit sample coords,
    interpolation done by grid_sample(align_corners=True) on the
    clamped coordinates. feat: [C, H, W] torch; boxes: [N, 4] numpy."""
    C, H, W = feat.shape
    N = boxes.shape[0]
    out = torch.zeros(N, C, pooled, pooled)
    for n in range(N):
        x1, y1, x2, y2 = boxes[n] * scale
        x1, y1 = x1 - 0.5, y1 - 0.5
        x2, y2 = x2 - 0.5, y2 - 0.5
        bw = (x2 - x1) / pooled
        bh = (y2 - y1) / pooled
        ys = y1 + (np.arange(pooled)[:, None] +
                   (np.arange(ratio)[None, :] + 0.5) / ratio) * bh
        xs = x1 + (np.arange(pooled)[:, None] +
                   (np.arange(ratio)[None, :] + 0.5) / ratio) * bw
        ys = ys.reshape(-1)  # [P*S]
        xs = xs.reshape(-1)
        yv = np.broadcast_to(ys[:, None], (ys.size, xs.size))
        xv = np.broadcast_to(xs[None, :], (ys.size, xs.size))
        valid = ((yv >= -1.0) & (yv <= H) & (xv >= -1.0) & (xv <= W))
        yc = np.clip(yv, 0, H - 1)
        xc = np.clip(xv, 0, W - 1)
        # normalized grid for align_corners=True: g = 2*c/(dim-1) - 1
        gy = 2.0 * yc / (H - 1) - 1.0 if H > 1 else np.zeros_like(yc)
        gx = 2.0 * xc / (W - 1) - 1.0 if W > 1 else np.zeros_like(xc)
        grid = torch.from_numpy(
            np.stack([gx, gy], axis=-1)[None].astype(np.float32))
        samp = torch.nn.functional.grid_sample(
            feat[None].float(), grid, mode="bilinear",
            padding_mode="border", align_corners=True)[0]  # [C, PS, PS]
        samp = samp * torch.from_numpy(valid.astype(np.float32))
        samp = samp.reshape(C, pooled, ratio, pooled, ratio)
        out[n] = samp.mean(dim=(2, 4))
    return out.numpy()


def _torch_roi_align_adaptive_ref(feat, boxes, scale, pooled,
                                  sr_cap=None):
    """d2 POOLER_SAMPLING_RATIO=0 semantics: per-box per-axis grid of
    ceil(roi_size/pooled) samples (empty grid -> zero output), averaged
    — the adaptive mode the reference runs. Built on the same
    grid_sample bilinear core as _torch_roi_align_ref. sr_cap mirrors
    the static ADAPTIVE_SR_MAX cap of the jax implementation."""
    C, H, W = feat.shape
    N = boxes.shape[0]
    out = torch.zeros(N, C, pooled, pooled)
    for n in range(N):
        x1, y1, x2, y2 = boxes[n] * scale
        x1, y1 = x1 - 0.5, y1 - 0.5
        x2, y2 = x2 - 0.5, y2 - 0.5
        roi_w, roi_h = x2 - x1, y2 - y1
        rx = int(np.ceil(roi_w / pooled))
        ry = int(np.ceil(roi_h / pooled))
        if sr_cap is not None:
            rx, ry = min(rx, sr_cap), min(ry, sr_cap)
        if rx <= 0 or ry <= 0:
            continue  # empty sampling loop in the CUDA kernel
        bw, bh = roi_w / pooled, roi_h / pooled
        ys = y1 + (np.arange(pooled)[:, None] +
                   (np.arange(ry)[None, :] + 0.5) / ry) * bh
        xs = x1 + (np.arange(pooled)[:, None] +
                   (np.arange(rx)[None, :] + 0.5) / rx) * bw
        ys = ys.reshape(-1)
        xs = xs.reshape(-1)
        yv = np.broadcast_to(ys[:, None], (ys.size, xs.size))
        xv = np.broadcast_to(xs[None, :], (ys.size, xs.size))
        valid = ((yv >= -1.0) & (yv <= H) & (xv >= -1.0) & (xv <= W))
        yc = np.clip(yv, 0, H - 1)
        xc = np.clip(xv, 0, W - 1)
        gy = 2.0 * yc / (H - 1) - 1.0 if H > 1 else np.zeros_like(yc)
        gx = 2.0 * xc / (W - 1) - 1.0 if W > 1 else np.zeros_like(xc)
        grid = torch.from_numpy(
            np.stack([gx, gy], axis=-1)[None].astype(np.float32))
        samp = torch.nn.functional.grid_sample(
            feat[None].float(), grid, mode="bilinear",
            padding_mode="border", align_corners=True)[0]
        samp = samp * torch.from_numpy(valid.astype(np.float32))
        samp = samp.reshape(C, pooled, ry, pooled, rx)
        out[n] = samp.mean(dim=(2, 4))
    return out.numpy()


def test_roi_align_adaptive_matches_torch_grid_sample():
    """POOLER_SAMPLING_RATIO=0 (the reference's operating point):
    small, medium, huge and degenerate ROIs against the torch adaptive
    reference — the AP-parity-critical numeric path."""
    from locov_tpu.ops.roi_align import roi_align

    rng = np.random.RandomState(11)
    H, W, C = 24, 32, 5
    feat = rng.randn(H, W, C).astype(np.float32)
    scale, pooled = 0.25, 7
    boxes = np.array([
        [10.0, 10.0, 11.0, 12.0],        # tiny: grid 1x1
        [4.0, 4.0, 60.0, 48.0],          # medium: mixed grid
        [0.0, 0.0, 128.0, 96.0],         # whole image: grid > 2
        [-8.0, -8.0, 140.0, 100.0],      # past borders, large grid
        [0.0, 0.0, 200.0, 190.0],        # big: grid up to 7x7
        [20.0, 20.0, 20.0, 28.0],        # zero width -> zero output
    ], np.float32)

    with jax.default_matmul_precision("highest"):
        ours = roi_align(jnp.asarray(feat), jnp.asarray(boxes), scale,
                         pooled=pooled, sampling_ratio=0)
    theirs = _torch_roi_align_adaptive_ref(
        torch.from_numpy(feat.transpose(2, 0, 1).copy()), boxes, scale,
        pooled)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), theirs,
        atol=1e-5, rtol=1e-5)
    assert np.abs(np.asarray(ours)[5]).max() == 0.0

    # beyond the static cap the grid saturates at ADAPTIVE_SR_MAX
    # (documented divergence; unreachable at production image sizes)
    from locov_tpu.ops.roi_align import ADAPTIVE_SR_MAX
    huge = np.array([[0.0, 0.0, 512.0, 400.0]], np.float32)
    with jax.default_matmul_precision("highest"):
        ours_h = roi_align(jnp.asarray(feat), jnp.asarray(huge), scale,
                           pooled=pooled, sampling_ratio=0)
    theirs_h = _torch_roi_align_adaptive_ref(
        torch.from_numpy(feat.transpose(2, 0, 1).copy()), huge, scale,
        pooled, sr_cap=ADAPTIVE_SR_MAX)
    np.testing.assert_allclose(
        np.asarray(ours_h).transpose(0, 3, 1, 2), theirs_h,
        atol=1e-5, rtol=1e-5)


def test_roi_align_matches_torch_grid_sample():
    from locov_tpu.ops.roi_align import roi_align

    rng = np.random.RandomState(4)
    H, W, C = 24, 20, 5
    feat = rng.randn(H, W, C).astype(np.float32)
    boxes = np.array([
        [4.0, 4.0, 60.0, 48.0],
        [0.0, 0.0, 8.0, 8.0],
        [-6.0, -6.0, 30.0, 30.0],       # clips past the border
        [70.0, 60.0, 95.0, 90.0],       # right/bottom edge
        [10.0, 10.0, 10.5, 11.0],       # tiny box
        [0.0, 0.0, 96.0, 80.0],         # whole image
    ], np.float32)
    scale, pooled, ratio = 0.25, 7, 2

    with jax.default_matmul_precision("highest"):
        ours = roi_align(jnp.asarray(feat), jnp.asarray(boxes), scale,
                         pooled=pooled, sampling_ratio=ratio)
    theirs = _torch_roi_align_ref(
        torch.from_numpy(feat.transpose(2, 0, 1).copy()), boxes, scale,
        pooled, ratio)
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), theirs,
        atol=1e-5, rtol=1e-5)


# ========================================== composed STT inference chain
class _TorchStage(torch.nn.Module):
    """A full d2 bottleneck stage (shortcut on block 0)."""

    def __init__(self, n, cin, cmid, cout, stride):
        super().__init__()
        blocks = [_TorchBottleneck(cin, cmid, cout, stride, True)]
        for _ in range(n - 1):
            blocks.append(_TorchBottleneck(cout, cmid, cout, 1, False))
        self.blocks = torch.nn.ModuleList(blocks)

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return x


def _tame_init(module, rng):
    """Re-init convs activation-preserving (kaiming fan_out/relu) and
    FrozenBN near identity, with the residual branch (conv3) damped so
    21 random blocks neither explode nor collapse to ties that make
    NMS ordering numerically unstable."""
    for m in module.modules():
        if isinstance(m, torch.nn.Conv2d):
            torch.nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                          nonlinearity="relu")
        elif isinstance(m, _TorchFrozenBN):
            n = m.weight.numel()
            m.weight.copy_(torch.from_numpy(
                rng.uniform(0.8, 1.2, n).astype(np.float32)))
            m.bias.copy_(torch.from_numpy(
                rng.normal(0, 0.05, n).astype(np.float32)))
            m.running_mean.copy_(torch.from_numpy(
                rng.normal(0, 0.05, n).astype(np.float32)))
            m.running_var.copy_(torch.from_numpy(
                rng.uniform(0.8, 1.2, n).astype(np.float32)))
    if isinstance(module, _TorchStage):
        for blk in module.blocks:
            blk.conv3.weight.mul_(0.3)  # damp per-block residual growth


def _d2_apply_deltas(deltas, boxes, weights):
    """d2 Box2BoxTransform.apply_deltas (class-agnostic)."""
    wx, wy, ww, wh = weights
    widths = boxes[:, 2] - boxes[:, 0]
    heights = boxes[:, 3] - boxes[:, 1]
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights
    dx, dy = deltas[:, 0] / wx, deltas[:, 1] / wy
    dw, dh = deltas[:, 2] / ww, deltas[:, 3] / wh
    clamp = np.log(1000.0 / 16)
    dw, dh = np.minimum(dw, clamp), np.minimum(dh, clamp)
    pcx = dx * widths + ctr_x
    pcy = dy * heights + ctr_y
    pw = np.exp(dw) * widths
    ph = np.exp(dh) * heights
    return np.stack([pcx - 0.5 * pw, pcy - 0.5 * ph,
                     pcx + 0.5 * pw, pcy + 0.5 * ph], axis=1)


def _np_iou(box, boxes):
    ix1 = np.maximum(box[0], boxes[:, 0])
    iy1 = np.maximum(box[1], boxes[:, 1])
    ix2 = np.minimum(box[2], boxes[:, 2])
    iy2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    a = (box[2] - box[0]) * (box[3] - box[1])
    b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    union = a + b - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _greedy_nms(boxes, scores, thr):
    """torchvision nms: score-descending greedy, suppress IoU > thr."""
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        iou = _np_iou(boxes[i], boxes)
        suppressed |= iou > thr
        suppressed[i] = True
    return keep


def _d2_fast_rcnn_single(probs, boxes_dec, hw, score_thresh, nms_thresh,
                         topk):
    """d2 fast_rcnn_inference_single_image: clip -> score-thresh ->
    per-class NMS (batched_nms) -> global top-k by score."""
    probs = probs[:, :-1]  # drop background column
    boxes = boxes_dec.copy()
    boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, hw[1])
    boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, hw[0])
    r, k = probs.shape
    cand = []  # (score, box, cls)
    for c in range(k):
        sel = np.flatnonzero(probs[:, c] > score_thresh)
        if sel.size == 0:
            continue
        keep = _greedy_nms(boxes[sel], probs[sel, c], nms_thresh)
        for j in keep:
            cand.append((probs[sel[j], c], boxes[sel[j]], c))
    cand.sort(key=lambda t: -t[0])
    cand = cand[:topk]
    if not cand:
        return (np.zeros((0, 4), np.float32), np.zeros(0, np.float32),
                np.zeros(0, np.int32))
    return (np.stack([t[1] for t in cand]).astype(np.float32),
            np.array([t[0] for t in cand], np.float32),
            np.array([t[2] for t in cand], np.int32))


@pytest.mark.slow
def test_composed_stt_inference_matches_torch():
    """VERDICT r3 Next #1: the COMPOSED end-to-end STT inference chain
    vs a torch build of the reference semantics — FrozenBN R50-C4 trunk
    + adaptive ROIAlign (grid_sample core) + res5 + emb_pred /
    frozen-class-matrix scores + the d2 decode/clip/score-thresh/
    per-class-NMS/top-k chain + detector_postprocess rescale
    (reference: ovr/modeling/roi_heads/box_emb_head.py:12-17,204-236,
    roi_emb_heads.py:247-282, ovr_rcnn.py:76-124). Weights shared via
    convert_d2_state_dict; detections must agree in count, class, score
    ORDER and coordinates at two image sizes in one padded batch plus a
    second bucket shape — pinning every cross-component numeric risk
    (NMS tie-breaks, clip order, bg-row handling) without COCO data."""
    from locov_tpu.config import get_cfg
    from locov_tpu.models import build_meta_arch
    from locov_tpu.structures.batches import (DetectionBatch, ImageBatch,
                                              ProposalBatch)

    rng = np.random.RandomState(7)
    emb_dim, num_classes = 16, 5

    # ---------------- torch reference build (full R50-C4 + res5)
    torch.manual_seed(7)
    stem_conv = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
    stem_norm = _TorchFrozenBN(64)
    res2 = _TorchStage(3, 64, 64, 256, 1)
    res3 = _TorchStage(4, 256, 128, 512, 2)
    res4 = _TorchStage(6, 512, 256, 1024, 2)
    res5 = _TorchStage(3, 1024, 512, 2048, 2)
    emb_pred = torch.nn.Linear(2048, emb_dim)
    bbox_pred = torch.nn.Linear(2048, 4)
    with torch.no_grad():
        for mod in (stem_conv, stem_norm, res2, res3, res4, res5):
            _tame_init(mod, rng)

    def trunk(x):
        x = torch.relu(stem_norm(stem_conv(x)))
        x = torch.nn.functional.max_pool2d(x, 3, 2, 1)
        return res4(res3(res2(x)))

    # calibrate the two head inits against the actual pooled-feature
    # magnitude (Caffe2 PIXEL_STD=1 inputs are O(100); random trunks
    # amplify unpredictably) so logits land at O(1) gaps — far above
    # cross-framework f32 conv noise, far below softmax saturation
    with torch.no_grad():
        probe = torch.from_numpy(
            (rng.rand(1, 3, 64, 64) * 2 - 1).astype(np.float32) * 100)
        pv = res5(trunk(probe)).mean(dim=(2, 3))
        v_rms = float(pv.pow(2).mean().sqrt().clamp(min=1e-6))
        torch.nn.init.normal_(emb_pred.weight, 0,
                              0.5 / (np.sqrt(2048) * v_rms))
        torch.nn.init.constant_(emb_pred.bias, 0.0)
        torch.nn.init.normal_(bbox_pred.weight, 0,
                              0.3 / (np.sqrt(2048) * v_rms))
        torch.nn.init.constant_(bbox_pred.bias, 0.0)

    # class-embedding matrix, background row = zeros
    class_emb = rng.randn(num_classes + 1, emb_dim).astype(np.float32)
    class_emb[-1] = 0.0

    # ---------------- our model (RPN-less: same proposals on both sides)
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "OvrRCNN"
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "PrecomputedProposals"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = num_classes
    cfg.MODEL.ROI_BOX_HEAD.EMBEDDING_BASED = True
    cfg.MODEL.ROI_BOX_HEAD.EMB_DIM = emb_dim
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_meta_arch(cfg)
    score_thresh = cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST
    nms_thresh = cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST
    weights = tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS)

    # ---------------- d2-named state dict -> our tree
    state = {}

    bn_leaves = ["weight", "bias", "running_mean", "running_var"]

    def put_bn(prefix, bn):
        for leaf in bn_leaves:
            state[f"{prefix}.{leaf}"] = getattr(bn, leaf).numpy()

    state["backbone.stem.conv1.weight"] = stem_conv.weight.detach().numpy()
    put_bn("backbone.stem.conv1.norm", stem_norm)
    for name, stage in [("backbone.res2", res2), ("backbone.res3", res3),
                        ("backbone.res4", res4),
                        ("roi_heads.res5", res5)]:
        for b, blk in enumerate(stage.blocks):
            for conv in ["conv1", "conv2", "conv3"]:
                state[f"{name}.{b}.{conv}.weight"] = \
                    getattr(blk, conv).weight.detach().numpy()
                put_bn(f"{name}.{b}.{conv}.norm",
                       getattr(blk, f"{conv}_norm"))
            if blk.shortcut is not None:
                state[f"{name}.{b}.shortcut.weight"] = \
                    blk.shortcut.weight.detach().numpy()
                put_bn(f"{name}.{b}.shortcut.norm", blk.shortcut_norm)
    state["roi_heads.box_predictor.emb_pred.weight"] = \
        emb_pred.weight.detach().numpy()
    state["roi_heads.box_predictor.emb_pred.bias"] = \
        emb_pred.bias.detach().numpy()
    state["roi_heads.box_predictor.bbox_pred.weight"] = \
        bbox_pred.weight.detach().numpy()
    state["roi_heads.box_predictor.bbox_pred.bias"] = \
        bbox_pred.bias.detach().numpy()
    converted = convert_d2_state_dict(state)

    mean = np.asarray(cfg.MODEL.PIXEL_MEAN, np.float32)
    std = np.asarray(cfg.MODEL.PIXEL_STD, np.float32)

    def run_case(bucket, hws, n_prop, n_valid):
        bh, bw = bucket
        bsz = len(hws)
        canvases = np.zeros((bsz, bh, bw, 3), np.float32)
        boxes = np.zeros((bsz, n_prop, 4), np.float32)
        mask = np.zeros((bsz, n_prop), bool)
        for i, (h, w) in enumerate(hws):
            canvases[i, :h, :w] = rng.rand(h, w, 3) * 255.0
            x1 = rng.uniform(0, w * 0.6, n_prop)
            y1 = rng.uniform(0, h * 0.6, n_prop)
            boxes[i, :, 0] = x1
            boxes[i, :, 1] = y1
            boxes[i, :, 2] = x1 + rng.uniform(6, w * 0.4, n_prop)
            boxes[i, :, 3] = y1 + rng.uniform(6, h * 0.4, n_prop)
            mask[i, :n_valid] = True
        hw = np.asarray(hws, np.int32)
        orig_hw = (hw * 2).astype(np.int32)  # rescale factor 2

        batch = DetectionBatch(
            images=ImageBatch(image=jnp.asarray(canvases),
                              hw=jnp.asarray(hw),
                              orig_hw=jnp.asarray(orig_hw)),
            proposals=ProposalBatch(
                boxes=jnp.asarray(boxes),
                objectness=jnp.zeros((bsz, n_prop), jnp.float32),
                mask=jnp.asarray(mask)))

        key = jax.random.PRNGKey(0)
        params = model.init(key, batch, jnp.asarray(class_emb),
                            method=model.inference)
        flat = flatten_params(params["params"])
        missing = [k for k in flat if k not in converted]
        assert not missing, f"transplant gaps: {missing}"
        params = {"params": unflatten_params(
            {k: converted[k].astype(np.float32) for k in flat})}
        dets = model.apply(params, batch, jnp.asarray(class_emb),
                           method=model.inference)

        for i, (h, w) in enumerate(hws):
            # torch chain on the SAME zero-padded normalized canvas
            xin = (canvases[i] - mean) / std
            valid_px = np.zeros((bh, bw, 1), np.float32)
            valid_px[:h, :w] = 1.0
            xin = xin * valid_px
            with torch.no_grad():
                feat = trunk(torch.from_numpy(
                    xin.transpose(2, 0, 1)[None].copy()))[0]
                vb = boxes[i][mask[i]]
                pooled = _torch_roi_align_adaptive_ref(
                    feat, vb, 1.0 / 16, 14)
                r5 = res5.forward(torch.from_numpy(pooled))
                v = r5.mean(dim=(2, 3))
                emb = emb_pred(v)
                logits = emb @ torch.from_numpy(class_emb).T
                probs = torch.softmax(logits, -1).numpy()
                deltas = bbox_pred(v).numpy()
            # sanity: scores well-separated (ties would make order moot)
            assert np.abs(logits.numpy()).max() < 30
            dec = _d2_apply_deltas(deltas, vb, weights)
            tb, ts, tc = _d2_fast_rcnn_single(
                probs, dec, (h, w), score_thresh, nms_thresh,
                cfg.TEST.DETECTIONS_PER_IMAGE)
            # detector_postprocess: rescale to original size + clip
            sc = orig_hw[i].astype(np.float32) / np.array([h, w],
                                                          np.float32)
            tb = tb * np.array([sc[1], sc[0], sc[1], sc[0]])
            tb[:, 0::2] = np.clip(tb[:, 0::2], 0, orig_hw[i][1])
            tb[:, 1::2] = np.clip(tb[:, 1::2], 0, orig_hw[i][0])

            om = np.asarray(dets.mask[i])
            ob = np.asarray(dets.boxes[i])[om]
            osc = np.asarray(dets.scores[i])[om]
            ocl = np.asarray(dets.classes[i])[om]
            assert len(ob) == len(tb), \
                f"det count: ours {len(ob)} vs torch {len(tb)}"
            np.testing.assert_array_equal(ocl, tc)
            np.testing.assert_allclose(osc, ts, atol=1e-4, rtol=1e-4)
            np.testing.assert_allclose(ob, tb, atol=2e-2, rtol=1e-4)

    # one padded batch with two image sizes + a second bucket shape
    run_case((64, 64), [(64, 64), (48, 56)], n_prop=12, n_valid=10)
    run_case((96, 64), [(96, 64)], n_prop=12, n_valid=12)


# ==================================================== TransformerHead (MMSS)
def test_composed_transformer_head_matches_torch():
    """Composed MMSS TransformerHead golden: our flax head vs a torch
    composition of the installed HF building blocks (BertEncoder /
    BertPooler / BertLMPredictionHead) wired with the REFERENCE's exact
    forward semantics (ovr/modeling/mmss_heads/transformer_head.py:
    105-254): v2l projection -> VisualEmbedding -> BxB pair replication
    -> joint encoder with the reference's RAW-ADDITIVE attention mask
    (the 0/1 mask is added to pre-softmax logits, :170-176 — attention
    leaks to padding; our default mode replicates this) -> pooled
    bi_seq_relationship[:, 0] BxB cost -> diagonal-pair MLM CE
    (ignore_index=-1) + bidirectional matching CE. Weights transplant
    through convert_lsm_extras, so this also pins the LSM-checkpoint
    import path for the multimodal encoder."""
    import torch.nn.functional as F
    from transformers import BertConfig as HFBertConfig
    from transformers.models.bert.modeling_bert import (
        BertEncoder as HFBertEncoder, BertPooler as HFBertPooler,
        BertLMPredictionHead)
    from locov_tpu.models.bert import BertConfig
    from locov_tpu.models.mmss import (TransformerHead,
                                       TransformerHeadConfig)
    from locov_tpu.structures.batches import (CaptionFeatures,
                                              RegionFeatures)
    from locov_tpu.utils.checkpoint import convert_lsm_extras

    B, W, R, V_DIM, LOC = 3, 7, 5, 24, 2
    kw = dict(vocab_size=90, hidden_size=32, num_hidden_layers=3,
              num_attention_heads=4, intermediate_size=48,
              max_position_embeddings=32, hidden_dropout_prob=0.0,
              attention_probs_dropout_prob=0.0)
    hf_cfg = HFBertConfig(attn_implementation="eager", **kw)
    our_cfg = BertConfig(**kw)
    H, V = kw["hidden_size"], kw["vocab_size"]

    torch.manual_seed(3)
    rng = np.random.RandomState(3)
    word_emb = rng.randn(V, H).astype(np.float32) * 0.2

    class _Heads(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.predictions = BertLMPredictionHead(hf_cfg)
            self.bi_seq_relationship = torch.nn.Linear(H, 2)

    class _VisualEmbedding(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.image_embeddings = torch.nn.Linear(H, H)
            self.image_location_embeddings = torch.nn.Linear(LOC, H)
            self.LayerNorm = torch.nn.LayerNorm(H, eps=1e-12)

    class _TorchTransformerHead(torch.nn.Module):
        """Reference forward, reimplemented (transformer_head.py)."""

        def __init__(self):
            super().__init__()
            self.v2l_projection = torch.nn.Linear(V_DIM, H)
            self.visual_emb = _VisualEmbedding()
            self.encoder = HFBertEncoder(hf_cfg)
            self.pooler = HFBertPooler(hf_cfg)
            self.heads = _Heads()
            # tie the MLM decoder to the word-embedding matrix
            # (reference _tie_weights, :69-78)
            self.heads.predictions.decoder.weight = torch.nn.Parameter(
                torch.from_numpy(word_emb))

        def forward(self, feats, rmask, loc, cap_emb, cmask, mlm_mask,
                    target_ids):
            target = torch.where(mlm_mask > 0, target_ids,
                                 torch.full_like(target_ids, -1))
            cmask = cmask.float()
            rmask = rmask.float()
            img = self.v2l_projection(feats)
            img = self.visual_emb.LayerNorm(
                self.visual_emb.image_embeddings(img)
                + self.visual_emb.image_location_embeddings(loc))
            # BxB pair replication: pair k = (caption k//B, image k%B)
            img = img[None].repeat(B, 1, 1, 1).reshape(B * B, R, H)
            cap = cap_emb[:, None].repeat(1, B, 1, 1).reshape(B * B, W, H)
            rm = rmask[None].repeat(B, 1, 1).reshape(B * B, R)
            cm = cmask[:, None].repeat(1, B, 1).reshape(B * B, W)
            tokens = torch.cat([cap, img], dim=1)
            att = torch.cat([cm, rm], dim=1)
            # the reference hands the RAW 0/1 mask to BertEncoder as
            # the additive bias (no (1-m)*-inf conversion)
            seq = self.encoder(tokens, att[:, None, None, :])[0]
            pooled = self.pooler(seq)
            pred_t = self.heads.predictions(seq[:, :W])
            score = self.heads.bi_seq_relationship(pooled)
            pred_t = torch.diagonal(pred_t.reshape(B, B, W, V),
                                    dim1=0, dim2=1).permute(2, 0, 1)
            mlm = F.cross_entropy(pred_t.reshape(-1, V),
                                  target.reshape(-1).long(),
                                  ignore_index=-1)
            pw_cost = score[:, 0].reshape(B, B)
            lc = torch.log_softmax(-pw_cost, dim=0)
            li = torch.log_softmax(-pw_cost, dim=1)
            match = -torch.diag(lc).mean() - torch.diag(li).mean()
            return mlm, match, pw_cost

    th = _TorchTransformerHead().eval()
    # randomize the params that default to degenerate values so the
    # comparison is not trivially aligned
    with torch.no_grad():
        for mod in th.modules():
            if isinstance(mod, torch.nn.LayerNorm):
                mod.weight.copy_(torch.from_numpy(
                    1.0 + 0.1 * rng.randn(*mod.weight.shape)
                    .astype(np.float32)))
                mod.bias.copy_(torch.from_numpy(
                    0.1 * rng.randn(*mod.bias.shape).astype(np.float32)))
        th.heads.predictions.bias.copy_(torch.from_numpy(
            0.1 * rng.randn(V).astype(np.float32)))

    # ------------------------------------------------------------ inputs
    feats = rng.randn(B, R, V_DIM).astype(np.float32)
    rmask = np.ones((B, R), np.int32)
    rmask[1, 3:] = 0                       # padded regions
    loc = rng.rand(B, R, LOC).astype(np.float32)
    cap_emb = rng.randn(B, W, H).astype(np.float32)
    cmask = np.ones((B, W), np.int32)
    cmask[2, 5:] = 0                       # padded caption
    ids = rng.randint(4, V, (B, W)).astype(np.int32)
    mlm_mask = np.zeros((B, W), np.int32)
    mlm_mask[0, 2] = 1
    mlm_mask[1, 1] = 1
    mlm_mask[2, 3] = 1

    with torch.no_grad():
        t_mlm, t_match, t_cost = th(
            torch.from_numpy(feats), torch.from_numpy(rmask),
            torch.from_numpy(loc), torch.from_numpy(cap_emb),
            torch.from_numpy(cmask), torch.from_numpy(mlm_mask),
            torch.from_numpy(ids))

    # ------------------------------------------------- our head, transplanted
    converted = convert_lsm_extras({
        "mmss_heads.TransformerHead." + k: v.detach().numpy()
        for k, v in th.state_dict().items()})
    prefix = "mmss_heads/transformer_head/"
    converted = {k[len(prefix):]: v for k, v in converted.items()
                 if k.startswith(prefix)}

    tcfg = TransformerHeadConfig(bert=our_cfg, mlm=True,
                                 mmm_loss="cross_entropy",
                                 return_dist=True)
    head = TransformerHead(tcfg=tcfg, v_dim=V_DIM, l_dim=H, loc_dim=LOC)
    cap = CaptionFeatures(
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(cmask),
        special_tokens_mask=jnp.zeros((B, W), jnp.int32),
        target_ids=jnp.asarray(ids), mlm_mask=jnp.asarray(mlm_mask),
        encoded_tokens=jnp.asarray(cap_emb),
        input_embeddings=jnp.asarray(cap_emb))
    img = RegionFeatures(features=jnp.asarray(feats),
                         mask=jnp.asarray(rmask.astype(bool)),
                         loc=jnp.asarray(loc))
    we = jnp.asarray(word_emb)
    params = head.init(jax.random.PRNGKey(0), img, cap, we)
    flat = flatten_params(params["params"])
    missing = [k for k in flat if k not in converted]
    assert not missing, f"no torch source for: {missing}"
    params = {"params": unflatten_params(
        {k: converted[k].astype(np.float32) for k in flat})}
    with jax.default_matmul_precision("highest"):
        other, losses, dists = head.apply(params, img, cap, we)

    np.testing.assert_allclose(np.asarray(dists["trans"]),
                               t_cost.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        float(losses["Masked Language Modeling Loss"]),
        float(t_mlm), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(
        float(losses["Image Caption Matching Loss"]),
        float(t_match), atol=2e-5, rtol=1e-5)

    # the proper-mask opt-in must CHANGE the result (padding no longer
    # attended): guards against the flag silently becoming a no-op
    tcfg_m = tcfg._replace(proper_attention_mask=True)
    head_m = TransformerHead(tcfg=tcfg_m, v_dim=V_DIM, l_dim=H,
                             loc_dim=LOC)
    with jax.default_matmul_precision("highest"):
        _, losses_m, _ = head_m.apply(params, img, cap, we)
    assert abs(float(losses_m["Masked Language Modeling Loss"])
               - float(t_mlm)) > 1e-4
