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


def test_reference_opt_state_resume_matches_uninterrupted(tmp_path, params):
    """-continue from a reference-format .ckpt restores Adam moments and the
    schedule position: a restored optimizer must produce the SAME next-step
    update as one that was never interrupted (reference train.py:371-386)."""
    import jax.numpy as jnp

    from unimm_tpu.train import optim

    lang = ["bert.encoder.layer.0.attention.self.query.weight",
            "cls.predictions.transform.dense.weight",
            "cls.predictions.bias"]
    ocfg = optim.OptimConfig(lr=1e-3, image_lr=5e-4, batch_multiply=2,
                             warmup_steps=4, t_total=40)
    tx = optim.make_optimizer(params, ocfg, lang)

    def rand_grads(seed):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef, [0.01 * jax.random.normal(k, l.shape)
                      for k, l in zip(keys, leaves)])

    # 6 micro-steps = 3 real updates under batch_multiply=2
    p, st = params, tx.init(params)
    import optax
    for i in range(6):
        upd, st = tx.update(rand_grads(i), st, p)
        p = optax.apply_updates(p, upd)

    iter_id = 6
    path = str(tmp_path / "ref_resume.ckpt")
    C.save_reference_ckpt(path, p, iter_id, opt_state=st,
                          lang_set=C.language_param_set(lang),
                          lr=ocfg.lr, image_lr=ocfg.image_lr)

    p2, st2, got_iter, n = C.load_reference_train_state(
        path, params, tx, batch_multiply=ocfg.batch_multiply)
    assert got_iter == iter_id and n > 0
    np.testing.assert_allclose(
        np.asarray(p2["cls"]["predictions"]["bias"]),
        np.asarray(p["cls"]["predictions"]["bias"]), rtol=0, atol=0)

    # moments round-trip exactly
    mu_a, nu_a, c_a = C.extract_adam_moments(st, p)
    mu_b, nu_b, c_b = C.extract_adam_moments(st2, p2)
    assert c_a == c_b == 3
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        mu_a, mu_b)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        nu_a, nu_b)

    # identical next TWO micro-steps (one full accumulation window) on the
    # continued vs the restored optimizer -> bit-identical params
    pa, sa, pb, sb = p, st, p2, st2
    for i in (100, 101):
        g = rand_grads(i)
        ua, sa = tx.update(g, sa, pa)
        pa = optax.apply_updates(pa, ua)
        ub, sb = tx.update(g, sb, pb)
        pb = optax.apply_updates(pb, ub)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        pa, pb)


def test_load_reference_train_state_weights_only_ckpt(tmp_path, params):
    """A weights-only .ckpt (no optimizer_state_dict) still resumes: fresh
    optimizer state, iter_id preserved."""
    from unimm_tpu.train import optim

    path = str(tmp_path / "weights_only.ckpt")
    C.save_reference_ckpt(path, params, 123)
    tx = optim.make_optimizer(params, optim.OptimConfig())
    p2, st2, iter_id, n = C.load_reference_train_state(path, params, tx)
    assert iter_id == 123 and n > 0
    mu, nu, count = C.extract_adam_moments(st2, p2)
    assert count == 0
    assert all(float(np.abs(x).sum()) == 0
               for x in jax.tree_util.tree_leaves(mu))


def test_exported_opt_state_loads_into_torch_adamw(tmp_path, params):
    """The exported optimizer_state_dict is loadable by a torch AdamW built
    the reference way (one param group per parameter, train.py:329-346)."""
    torch = pytest.importorskip("torch")
    from unimm_tpu.train import optim

    tx = optim.make_optimizer(params, optim.OptimConfig())
    st = tx.init(params)
    path = str(tmp_path / "for_torch.ckpt")
    C.save_reference_ckpt(path, params, 7, opt_state=st, lang_set=set())

    blob = torch.load(path, map_location="cpu", weights_only=False)
    msd = blob["model_state_dict"]
    t_params, groups = [], []
    for k, v in msd.items():
        if C._normalize_key(k) == "cls.predictions.decoder.weight":
            continue
        tp = torch.nn.Parameter(v.clone().float())
        t_params.append(tp)
        groups.append({"params": [tp]})
    opt = torch.optim.AdamW(groups, lr=2e-5)
    opt.load_state_dict(blob["optimizer_state_dict"])
    for tp in t_params:
        tp.grad = torch.zeros_like(tp)
    opt.step()  # state is structurally sound for torch


def test_targz_archive_loading(tmp_path):
    """Local HF-style .tar.gz archives (pytorch_model.bin inside) load via
    load_reference_ckpt — the offline half of the reference's
    from_pretrained archive resolution (vilbert_dialog.py:1123-1232)."""
    import tarfile

    import jax
    import numpy as np
    import torch

    from tests.test_model import TINY
    from unimm_tpu import checkpoint as C
    from unimm_tpu.models import vilbert

    params = vilbert.init_params(jax.random.PRNGKey(3), TINY)
    sd = {k: torch.from_numpy(np.array(v)) for k, v in
          C.to_torch_state_dict(params, prefix="").items()}
    inner = tmp_path / "model"
    inner.mkdir()
    torch.save(sd, inner / "pytorch_model.bin")
    archive = tmp_path / "weights.tar.gz"
    with tarfile.open(archive, "w:gz") as t:
        t.add(inner / "pytorch_model.bin", arcname="pytorch_model.bin")

    template = vilbert.init_params(jax.random.PRNGKey(4), TINY)
    loaded, _iter, n, skipped = C.load_reference_ckpt(str(archive), template)
    assert not skipped
    for (pa, a), (pb, b) in zip(C.iter_param_items(params),
                                C.iter_param_items(loaded)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resume_preserves_mu_dtype(tmp_path, params):
    """-adam_mu_dtype bfloat16 + .ckpt resume: the grafted moments keep the
    template leaf dtype (restoring fp32 mu would retrace the train step for
    one step and transiently double mu HBM)."""
    import jax.numpy as jnp
    import optax

    from unimm_tpu.train import optim

    ocfg = optim.OptimConfig(lr=1e-3, mu_dtype="bfloat16")
    tx = optim.make_optimizer(params, ocfg)
    st = tx.init(params)
    path = str(tmp_path / "mu_bf16.ckpt")
    C.save_reference_ckpt(path, params, 4, opt_state=st)
    _, st2, _, _ = C.load_reference_train_state(path, params, tx)

    def dtypes(node, pick):
        out = []

        def rec(n):
            if isinstance(n, optax.ScaleByAdamState):
                out.extend(l.dtype for l in jax.tree_util.tree_leaves(
                    getattr(n, pick)))
            elif hasattr(n, "_fields"):
                for f in n._fields:
                    rec(getattr(n, f))
            elif isinstance(n, (tuple, list)):
                for x in n:
                    rec(x)
            elif isinstance(n, dict):
                for x in n.values():
                    rec(x)

        rec(node)
        return out

    assert dtypes(st2, "mu") == dtypes(st, "mu")
    assert set(dtypes(st2, "mu")) == {jnp.bfloat16.dtype}
    assert set(dtypes(st2, "nu")) == {jnp.float32.dtype}
