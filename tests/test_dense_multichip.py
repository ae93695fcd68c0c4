"""Multi-device dense finetuning: the padded-slate dp sharding must be loss-
equivalent to the single-device (replicated) run.

The reference scatters the 100-option dense slate unevenly across 4 GPUs
(/root/reference/dense_annotation_finetuning.py:138 via
utils/data_parallel.py:16-57,91-132). The TPU-native equivalent pads the
slate to the next dp-divisible size with neutralised rows (lm_weight 0,
labels -1, nsp/rank statically sliced to the real rows) and dp-shards it —
these tests prove padding + sharding changes nothing about the losses.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unimm_tpu.cli.dense_finetune import make_dense_step
from unimm_tpu.models import vilbert
from unimm_tpu.parallel import mesh as pmesh
from unimm_tpu.train import optim

from tests.test_pallas_v2 import TINY, _tiny_batch

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the virtual 8-device mesh")

N_REAL = 10  # tiny stand-in for the 100-option slate


def _no_dropout(cfg):
    return dataclasses.replace(cfg, hidden_dropout_prob=0.0,
                               attention_probs_dropout_prob=0.0,
                               v_hidden_dropout_prob=0.0,
                               v_attention_probs_dropout_prob=0.0)


def _slate(rng, cfg, n):
    batch = {k: np.asarray(v) for k, v in
             _tiny_batch(rng, cfg, B=n, train=True).items()}
    batch.pop("image_target")
    batch.pop("image_label")
    gt_rel = np.zeros(N_REAL, np.float32)
    gt_rel[0] = 1.0
    gt_rel[3] = 0.4
    return batch, gt_rel


def _pad(batch, S):
    n = batch["tokens"].shape[0]
    out = {k: np.concatenate([v, np.repeat(v[:1], S - n, axis=0)])
           for k, v in batch.items()}
    out["lm_weight"][n:] = 0.0
    out["mlm_labels"][n:] = -1
    return out


def _run(cfg, batch, gt_rel, mesh):
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    if mesh is not None:
        params, _ = pmesh.shard_params(params, mesh)
        batch = pmesh.shard_batch(batch, mesh)
    else:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
    tx = optim.make_optimizer(params, optim.OptimConfig(warmup_steps=10,
                                                        t_total=100))
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.zeros((), jnp.int32),
             "rng": jax.random.PRNGKey(0)}
    step = make_dense_step(cfg, tx, dtype=jnp.float32, mesh=mesh,
                           n_real=N_REAL)
    state, parts = step(state, batch, jnp.asarray(gt_rel))
    return state, {k: float(v) for k, v in parts.items()}


@pytest.mark.parametrize("impl", ["xla", "pallas_block"])
def test_padded_dp_slate_matches_replicated(impl):
    cfg = _no_dropout(dataclasses.replace(TINY, attention_impl=impl))
    batch, gt_rel = _slate(np.random.default_rng(0), cfg, N_REAL)

    _, plain = _run(cfg, batch, gt_rel, None)

    mesh = pmesh.make_mesh(4, mp=1)          # S = 12, 4 devices x 3 rows
    S = -(-N_REAL // mesh.shape[pmesh.DP]) * mesh.shape[pmesh.DP]
    assert S == 12
    _, sharded = _run(cfg, _pad(batch, S), gt_rel, mesh)

    assert plain.keys() == sharded.keys()
    for k in plain:
        np.testing.assert_allclose(sharded[k], plain[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)
        assert np.isfinite(sharded[k]), (k, sharded)


def test_padded_rows_get_no_gradient_signal():
    """The padded step must produce the same parameter update as the
    unpadded one (pad rows carry zero loss weight end-to-end)."""
    cfg = _no_dropout(TINY)
    batch, gt_rel = _slate(np.random.default_rng(1), cfg, N_REAL)
    st_plain, _ = _run(cfg, batch, gt_rel, None)
    mesh = pmesh.make_mesh(4, mp=1)
    st_shard, _ = _run(cfg, _pad(batch, 12), gt_rel, mesh)
    a = jax.tree_util.tree_leaves(jax.device_get(st_plain["params"]))
    b = jax.tree_util.tree_leaves(jax.device_get(st_shard["params"]))
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-4, atol=1e-6)


def test_dense_step_length_sliced_matches_full():
    """Slicing the dense slate to its covering length bucket (exact under
    the descriptor masks) must not change any loss term."""
    from unimm_tpu.ops import masks as M_masks

    cfg = _no_dropout(TINY)
    batch, gt_rel = _slate(np.random.default_rng(3), cfg, N_REAL)
    # short slate: extents well under max_seq_len
    batch["ctx_end"] = np.asarray(
        np.random.default_rng(4).integers(6, 10, N_REAL), np.int32)
    batch["ans_len"] = np.minimum(batch["ans_len"], 3).astype(np.int32)
    labels = np.full_like(batch["mlm_labels"], -1)
    for i in range(N_REAL):
        s, e = int(batch["ctx_end"][i] - batch["ans_len"][i]), \
            int(batch["ctx_end"][i])
        labels[i, s:e] = np.random.default_rng(i).integers(
            0, cfg.vocab_size, e - s)
    batch["mlm_labels"] = labels
    batch["lm_weight"] = (labels != -1).astype(np.float32)

    _, full = _run(cfg, batch, gt_rel, None)

    ext = M_masks.attended_extent(batch["mode"], batch["ctx_end"],
                                  batch["ans_len"], cfg.max_seq_len,
                                  batch["mlm_labels"])
    Lb = M_masks.quarter_bucket(int(ext.max()), cfg.max_seq_len, div=8)
    assert Lb < cfg.max_seq_len
    sliced = dict(batch)
    for key in ("tokens", "segments", "mlm_labels", "lm_weight"):
        sliced[key] = np.ascontiguousarray(batch[key][:, :Lb])
    _, cut = _run(cfg, sliced, gt_rel, None)

    assert full.keys() == cut.keys()
    for k in full:
        np.testing.assert_allclose(cut[k], full[k], rtol=2e-5, atol=2e-6,
                                   err_msg=k)
