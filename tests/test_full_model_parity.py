"""Full-model fp32 numerical parity against the REFERENCE torch encoder.

This is the composition-level oracle the piecewise tests cannot provide: it
instantiates the reference ``BertForMultiModalPreTraining``
(/root/reference/models/vilbert_dialog.py:1496) at full flagship size on CPU,
exports its random-init ``state_dict`` through our checkpoint converter, runs
BOTH models on fixed mixed dis+gen inputs (reference: host-built dense masks;
ours: 3-int descriptors), and asserts

* ``prediction_scores_t`` / ``prediction_scores_v`` /
  ``seq_relationship_score`` agree to <= 1e-4 (eval path,
  vilbert_dialog.py:1626), and
* train-mode ``(masked_lm_loss, masked_img_loss, next_sentence_loss)`` agree
  (vilbert_dialog.py:1559-1624), on both the dense and the gathered MLM path.

``pytorch_transformers`` / ``pytorch_pretrained_bert`` are absent from this
environment, but vilbert_dialog.py:34,36 imports only ``BertEmbeddings``
(never used) and ``cached_path`` (only used by from_pretrained, which we do
not call) — two sys.modules shims let the model instantiate. The sinusoid
``pe`` buffer is built with ``.cuda()`` at init (vilbert_dialog.py:314, a side
effect the reference never guards); ``torch.Tensor.cuda`` is patched to
identity while the module is alive.
"""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")
torch = pytest.importorskip("torch")
pytest.importorskip("utils.data_utils",
                    reason="reference checkout not available")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unimm_tpu import checkpoint as C  # noqa: E402
from unimm_tpu.config import VilbertConfig  # noqa: E402
from unimm_tpu.data import encoding  # noqa: E402
from unimm_tpu.models import unimm, vilbert  # noqa: E402
from unimm_tpu.ops import masks  # noqa: E402

CLS, SEP, MASK = 101, 102, 103
VOCAB = 30522
REF_JSON = "/root/reference/config/bert_base_6layer_6conect.json"


def _install_shims():
    if "pytorch_transformers" not in sys.modules:
        pt = types.ModuleType("pytorch_transformers")
        mb = types.ModuleType("pytorch_transformers.modeling_bert")

        class BertEmbeddings:  # imported at vilbert_dialog.py:34, never used
            pass

        mb.BertEmbeddings = BertEmbeddings
        pt.modeling_bert = mb
        sys.modules["pytorch_transformers"] = pt
        sys.modules["pytorch_transformers.modeling_bert"] = mb
    if "pytorch_pretrained_bert" not in sys.modules:
        pp = types.ModuleType("pytorch_pretrained_bert")
        fu = types.ModuleType("pytorch_pretrained_bert.file_utils")

        def cached_path(*a, **k):  # only reached via from_pretrained
            raise RuntimeError("no network access in tests")

        fu.cached_path = cached_path
        pp.file_utils = fu
        sys.modules["pytorch_pretrained_bert"] = pp
        sys.modules["pytorch_pretrained_bert.file_utils"] = fu


def _rand_dialog(rng, n_utt, max_words=9):
    return [[int(rng.integers(1000, 29000))
             for _ in range(int(rng.integers(2, max_words)))]
            for _ in range(n_utt)]


@pytest.fixture(scope="module")
def world():
    _install_shims()
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        import importlib
        ref_vd = importlib.import_module("models.vilbert_dialog")
        ref_du = importlib.import_module("utils.data_utils")

        ref_config = ref_vd.BertConfig.from_json_file(REF_JSON)
        torch.manual_seed(0)
        ref_model = ref_vd.BertForMultiModalPreTraining(ref_config)
        ref_model.eval()
    finally:
        torch.Tensor.cuda = orig_cuda

    cfg = VilbertConfig.from_json_file(REF_JSON)
    template = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params, n, skipped = C.from_torch_state_dict(template, sd)
    assert not skipped, skipped
    assert n == len(C.iter_param_items(template)), n

    # ---- fixed mixed-mode batch: 3 dis + 3 gen (one negative of each) ----
    rng = np.random.default_rng(42)
    L, R = cfg.max_seq_len, cfg.max_regions
    specs = [  # (mode, n_utt, start_segment, is_neg, weight)
        ("dis", 5, 0, 0, 1.0), ("dis", 3, 1, 1, 1.0), ("dis", 21, 0, 0, 1.0),
        ("gen", 5, 0, 0, 1.0), ("gen", 3, 1, 1, 2.0), ("gen", 21, 0, 0, 1.0),
    ]
    ref_ch = {k: [] for k in
              ("tok", "seg", "pos", "lab", "w", "att", "co")}
    ours = []
    for mode, n_utt, start, neg, w in specs:
        utts = _rand_dialog(rng, n_utt)
        ref_fn = (ref_du.encode_input_dis if mode == "dis"
                  else ref_du.encode_input_gen)
        r = ref_fn([list(u) for u in utts], start, CLS, SEP, MASK,
                   max_seq_len=L, mask_prob=0, is_negtive=neg, weight=w,
                   vocab_size=VOCAB)
        (r_tok, r_seg, r_pos, _r_sep, r_lab, r_w, r_att, r_co) = r
        for key, val in zip(("tok", "seg", "pos", "lab", "w", "att", "co"),
                            (r_tok, r_seg, r_pos, r_lab, r_w, r_att, r_co)):
            ref_ch[key].append(val[0].numpy())
        our_fn = encoding.encode_dis if mode == "dis" else encoding.encode_gen
        e = our_fn(utts, start, CLS, SEP, MASK, max_seq_len=L, mask_prob=0,
                   is_negative=bool(neg), weight=w, vocab_size=VOCAB,
                   rng=np.random.default_rng(0))
        # identical inputs by construction (bit-parity tested elsewhere;
        # re-asserted so a drift here can't masquerade as model divergence)
        np.testing.assert_array_equal(e.tokens, ref_ch["tok"][-1])
        np.testing.assert_array_equal(e.positions, ref_ch["pos"][-1])
        ours.append(e)

    B = len(specs)
    stacked = {k: np.stack(v).astype(np.int64) for k, v in ref_ch.items()}
    # image channels: identical random values both sides, one short mask
    image_feat = rng.normal(size=(B, R, cfg.v_feature_size)).astype(np.float32)
    image_loc = rng.uniform(size=(B, R, 5)).astype(np.float32)
    n_boxes = np.array([R, 20, R, 30, R, 25], np.int64)
    image_mask = (np.arange(R)[None, :] < n_boxes[:, None]).astype(np.int64)

    batch = {
        "tokens": jnp.asarray(stacked["tok"], jnp.int32),
        "segments": jnp.asarray(stacked["seg"], jnp.int32),
        "mode": jnp.asarray([0, 0, 0, 1, 1, 1], jnp.int32),
        "ctx_end": jnp.asarray([e.ctx_end for e in ours], jnp.int32),
        "ans_len": jnp.asarray([e.ans_len for e in ours], jnp.int32),
        "mlm_labels": jnp.asarray(stacked["lab"], jnp.int32),
        "image_feat": jnp.asarray(image_feat),
        "image_loc": jnp.asarray(image_loc),
        "image_mask": jnp.asarray(image_mask, jnp.int32),
    }
    # descriptor-built positions == reference host-built channel
    np.testing.assert_array_equal(
        np.asarray(masks.position_ids(batch["mode"], batch["ctx_end"],
                                      batch["ans_len"], L)),
        stacked["pos"])

    t = {
        "input_ids": torch.from_numpy(stacked["tok"]),
        "token_type_ids": torch.from_numpy(stacked["seg"]),
        "position_ids": torch.from_numpy(stacked["pos"]),
        "attention_mask": torch.from_numpy(np.stack(ref_ch["att"])),
        "image_attention_mask": torch.from_numpy(image_mask),
        "co_attention_mask": torch.from_numpy(
            np.repeat(stacked["co"][:, None, :], R, axis=1)),
        "image_feat": torch.from_numpy(image_feat),
        "image_loc": torch.from_numpy(image_loc),
    }
    return dict(cfg=cfg, params=params, ref_model=ref_model, batch=batch,
                torch_inputs=t, lm_weight=np.stack(ref_ch["w"]),
                labels=stacked["lab"], rng=rng)


@pytest.mark.slow
def test_eval_outputs_match(world):
    """prediction_scores_t / _v / seq_relationship_score <= 1e-4 (fp32)."""
    cfg, params, batch, t = (world["cfg"], world["params"], world["batch"],
                             world["torch_inputs"])
    with torch.no_grad():
        p_t, p_v, nsp, _seq_t, _ = world["ref_model"](
            t["input_ids"], t["image_feat"], t["image_loc"],
            token_type_ids=t["token_type_ids"],
            position_ids=t["position_ids"],
            attention_mask=t["attention_mask"],
            image_attention_mask=t["image_attention_mask"],
            co_attention_mask=t["co_attention_mask"])

    @jax.jit
    def run(p, b):
        t_seq, v_seq, pt, pv = unimm.encode(p, cfg, b, train=False,
                                            dtype=jnp.float32)
        return vilbert.pretraining_heads(p, cfg, t_seq, v_seq, pt, pv,
                                         train=False)

    mlm, img, nsp_j = run(params, batch)
    for name, ref_t, got in (("prediction_scores_t", p_t, mlm),
                             ("prediction_scores_v", p_v, img),
                             ("seq_relationship_score", nsp, nsp_j)):
        diff = np.max(np.abs(ref_t.numpy() - np.asarray(got)))
        assert diff <= 1e-4, (name, float(diff))

    # the production eval path (gathered online-softmax NLL) matches the NLL
    # computed from the reference's dense logits
    out = unimm.forward_eval(params, cfg, batch, dtype=jnp.float32)
    logp = torch.log_softmax(p_t.float(), dim=-1).numpy()
    labels = world["labels"]
    take = np.where(labels >= 0, labels, 0)
    nll = -np.take_along_axis(logp, take[..., None], axis=-1)[..., 0]
    ref_sum = (nll * (labels >= 0)).sum(-1)
    np.testing.assert_allclose(np.asarray(out["lm_nll_sum"]), ref_sum,
                               atol=2e-4, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["dense", "gathered"])
def test_train_losses_match(world, impl):
    """(lm, img, nsp) train losses match vilbert_dialog.py:1559-1624."""
    cfg = world["cfg"].replace(mlm_loss_impl=impl)
    params, batch, t = world["params"], dict(world["batch"]), \
        world["torch_inputs"]
    rng = world["rng"]
    B, L = world["labels"].shape
    R = cfg.max_regions
    image_label = rng.choice([-1, 0, 1], (B, R)).astype(np.int64)
    image_label[:, 0] = -1  # <IMG> row excluded (encode_image_input)
    image_target = rng.dirichlet(np.ones(cfg.v_target_size),
                                 (B, R)).astype(np.float32)
    nsp_label = np.array([0, 1, 0, 1, 0, 1], np.int64)
    nsp_weight = np.array([3.0, 1.0], np.float32)

    with torch.no_grad():
        lm_l, img_l, nsp_l, _, _, _ = world["ref_model"](
            t["input_ids"], t["image_feat"], t["image_loc"],
            token_type_ids=t["token_type_ids"],
            position_ids=t["position_ids"],
            attention_mask=t["attention_mask"],
            image_attention_mask=t["image_attention_mask"],
            co_attention_mask=t["co_attention_mask"],
            masked_lm_labels=torch.from_numpy(world["labels"].astype(np.int64)),
            image_label=torch.from_numpy(image_label),
            image_target=torch.from_numpy(image_target),
            next_sentence_label=torch.from_numpy(nsp_label),
            nsp_weight=torch.from_numpy(nsp_weight[None]),
            lm_weight=torch.from_numpy(world["lm_weight"]))

    batch.update({
        "lm_weight": jnp.asarray(world["lm_weight"]),
        "image_label": jnp.asarray(image_label, jnp.int32),
        "image_target": jnp.asarray(image_target),
        "next_sentence_label": jnp.asarray(nsp_label, jnp.int32),
    })
    losses = jax.jit(
        lambda p, b: unimm.forward_train(
            p, cfg, b, rng=None, nsp_weight=jnp.asarray(nsp_weight),
            dtype=jnp.float32, train=False))(params, batch)
    for name, ref_v, got in (("lm", lm_l, losses["lm"]),
                             ("img", img_l, losses["img"]),
                             ("nsp", nsp_l, losses["nsp"])):
        diff = abs(float(ref_v.item()) - float(got))
        assert diff <= 1e-4, (name, impl, float(ref_v.item()), float(got))
