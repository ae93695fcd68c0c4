"""Checkpoint conversion and optimizer-grouping tests."""

import numpy as np
import pytest

import jax

from tests.test_model import TINY
from unimm_tpu import checkpoint as C
from unimm_tpu.models import vilbert


@pytest.fixture(scope="module")
def params():
    return vilbert.init_params(jax.random.PRNGKey(0), TINY)


def test_torch_names_match_reference_layout(params):
    names = set(C.name_map(params))
    # spot-check canonical reference keys (vilbert_dialog.py module tree)
    for k in [
        "bert.embeddings.word_embeddings.weight",
        "bert.embeddings.token_type_embeddings_extension.weight",
        "bert.embeddings.sep_embeddings.weight",
        "bert.embeddings.LayerNorm.weight",
        "bert.encoder.layer.0.attention.self.query.weight",
        "bert.encoder.layer.1.attention.output.LayerNorm.bias",
        "bert.encoder.layer.0.intermediate.dense.weight",
        "bert.encoder.layer.0.output.dense.bias",
        "bert.encoder.v_layer.0.attention.self.key.weight",
        "bert.encoder.c_layer.0.biattention.query1.weight",
        "bert.encoder.c_layer.0.biOutput.dense1.weight",
        "bert.encoder.c_layer.0.biOutput.q_dense2.bias",
        "bert.encoder.c_layer.0.v_intermediate.dense.weight",
        "bert.encoder.c_layer.0.t_output.LayerNorm.weight",
        "bert.t_pooler.dense.weight",
        "bert.v_pooler.dense.bias",
        "bert.v_embeddings.image_embeddings.weight",
        "bert.v_embeddings.image_location_embeddings.bias",
        "cls.predictions.bias",
        "cls.predictions.transform.dense.weight",
        "cls.predictions.transform.LayerNorm.bias",
        "cls.bi_seq_relationship.weight",
        "cls.imagePredictions.transform.dense.weight",
        "cls.imagePredictions.decoder.bias",
    ]:
        assert k in names, k


def test_roundtrip_state_dict(params):
    sd = C.to_torch_state_dict(params)
    assert "bert_pretrained.cls.predictions.decoder.weight" in sd
    # linear weights exported transposed
    kern = np.asarray(params["bert"]["t_pooler"]["dense"]["kernel"])
    np.testing.assert_array_equal(
        sd["bert_pretrained.bert.t_pooler.dense.weight"], kern.T)

    zero = jax.tree_util.tree_map(lambda x: np.zeros_like(x), params)
    restored, n, skipped = C.from_torch_state_dict(zero, sd)
    assert not skipped
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(restored)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gamma_beta_and_prefix_normalization(params):
    sd = C.to_torch_state_dict(params, prefix="")
    legacy = {}
    for k, v in sd.items():
        k = "module.bert_pretrained." + k.replace(
            "LayerNorm.weight", "LayerNorm.gamma").replace(
            "LayerNorm.bias", "LayerNorm.beta")
        legacy[k] = v
    zero = jax.tree_util.tree_map(lambda x: np.zeros_like(x), params)
    restored, n, skipped = C.from_torch_state_dict(zero, legacy)
    assert not skipped
    ln = np.asarray(
        restored["bert"]["embeddings"]["LayerNorm"]["weight"])
    np.testing.assert_array_equal(
        ln, np.asarray(params["bert"]["embeddings"]["LayerNorm"]["weight"]))


def test_shape_mismatch_raises(params):
    sd = C.to_torch_state_dict(params)
    sd["bert_pretrained.bert.t_pooler.dense.weight"] = np.zeros((3, 3))
    with pytest.raises(ValueError):
        C.from_torch_state_dict(params, sd)


def test_reference_ckpt_file_roundtrip(tmp_path, params):
    path = str(tmp_path / "model.ckpt")
    C.save_reference_ckpt(path, params, iter_id=123)
    zero = jax.tree_util.tree_map(lambda x: np.zeros_like(x), params)
    restored, iter_id, n, skipped = C.load_reference_ckpt(path, zero)
    assert iter_id == 123 and not skipped
    np.testing.assert_array_equal(
        np.asarray(restored["cls"]["predictions"]["bias"]),
        np.asarray(params["cls"]["predictions"]["bias"]))
    # torch itself can read it back
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    assert "model_state_dict" in blob and blob["iter_id"] == 123


def test_group_labels(params):
    lang = C.language_param_set([
        "bert_pretrained.bert.embeddings.word_embeddings.weight",
        "bert_pretrained.bert.encoder.layer.0.attention.self.query.weight",
        "bert_pretrained.bert.encoder.layer.0.attention.output.LayerNorm.weight",
        "bert_pretrained.cls.predictions.bias",
        "bert_pretrained.bert.pooler.dense.weight",   # stale name: no match
    ])
    assert C.group_label(("bert", "embeddings", "word_embeddings"),
                         lang) == "lang_decay"
    assert C.group_label(
        ("bert", "encoder", "layer", "0", "attention", "self", "query",
         "kernel"), lang) == "lang_decay"
    assert C.group_label(
        ("bert", "encoder", "layer", "0", "attention", "output", "LayerNorm",
         "weight"), lang) == "lang_nodecay"
    assert C.group_label(("cls", "predictions", "bias"), lang) == "lang_nodecay"
    # stale reference name means t_pooler falls to image lr (reference quirk)
    assert C.group_label(("bert", "t_pooler", "dense", "kernel"),
                         lang) == "img_decay"
    assert C.group_label(("bert", "v_embeddings", "image_embeddings",
                          "bias"), lang) == "img_nodecay"
