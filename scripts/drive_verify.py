"""Verify drive: unimm_tpu public API end-to-end on a virtual CPU mesh."""
import os

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import jax.numpy as jnp

from unimm_tpu.config import VilbertConfig
from unimm_tpu.models import unimm, vilbert

cfg = VilbertConfig.from_json_file(
    "/root/reference/config/bert_base_6layer_6conect.json").replace(
    vocab_size=512, hidden_size=64, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=128,
    max_position_embeddings=64,
    v_feature_size=64, v_target_size=16, v_hidden_size=32,
    v_num_hidden_layers=2, v_num_attention_heads=2, v_intermediate_size=64,
    bi_hidden_size=32, bi_num_attention_heads=2,
    v_biattention_id=(0, 1), t_biattention_id=(2, 3),
    max_seq_len=48, max_regions=8)
params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)

B, L, R = 8, cfg.max_seq_len, cfg.max_regions
mode = np.array([0, 0, 0, 1, 1, 1, 1, 1], np.int32)
ctx_end = np.array([20, 30, 12, 18, 25, 40, 46, 10], np.int32)
ans_len = np.where(mode == 1, np.array([0, 0, 0, 3, 4, 5, 6, 2]), 0).astype(np.int32)
# one truncated gen case: ctx_end + ans_len > max_seq_len (46 + 6 = 52 > 48)
batch = {
    "tokens": rng.integers(1, cfg.vocab_size, (B, L)).astype(np.int32),
    "segments": rng.integers(0, 2, (B, L)).astype(np.int32),
    "mode": mode, "ctx_end": ctx_end, "ans_len": ans_len,
    "image_feat": rng.normal(size=(B, R, cfg.v_feature_size)).astype(np.float32),
    "image_loc": rng.normal(size=(B, R, 5)).astype(np.float32),
    "image_mask": np.ones((B, R), np.int32),
}
labels = np.full((B, L), -1, np.int32)
for i in range(B):
    s, e = max(int(ctx_end[i]) - int(ans_len[i]), 1), min(int(ctx_end[i]), L)
    labels[i, s:e] = rng.integers(0, cfg.vocab_size, e - s)
batch["mlm_labels"] = labels

out = unimm.forward_eval(params, cfg, {k: jnp.asarray(v) for k, v in batch.items()},
                         dtype=jnp.float32)
assert np.isfinite(np.asarray(out["nsp_logits"])).all()
assert np.isfinite(np.asarray(out["lm_nll_sum"])).all()
print("forward_eval ok", np.asarray(out["lm_nll_sum"])[:3])

tb = dict(batch)
w = np.zeros((B, L), np.float32)
w[labels != -1] = 1.0
w[4][labels[4] != -1] = -1.0
tb["lm_weight"] = w
tb["next_sentence_label"] = rng.integers(0, 2, B).astype(np.int32)
tb["image_target"] = rng.dirichlet(np.ones(cfg.v_target_size), (B, R)).astype(np.float32)
tb["image_label"] = rng.choice([-1, 0, 1], (B, R)).astype(np.int32)
losses = unimm.forward_train(params, cfg,
                             {k: jnp.asarray(v) for k, v in tb.items()},
                             rng=jax.random.PRNGKey(1), dtype=jnp.float32,
                             nsp_weight=jnp.asarray([1.0, 1.0]))
for k in ("lm", "img", "nsp"):
    assert np.isfinite(float(losses[k])), (k, losses[k])
print("forward_train ok", {k: round(float(v), 3) for k, v in losses.items()})

# degenerate descriptors stay finite
bad = dict(batch)
bad["ctx_end"] = np.array([2] * B, np.int32)
bad["ans_len"] = np.array([5] * B, np.int32)
o2 = unimm.forward_eval(params, cfg, {k: jnp.asarray(v) for k, v in bad.items()},
                        dtype=jnp.float32)
assert np.isfinite(np.asarray(o2["nsp_logits"])).all()
print("degenerate descriptors ok")

# bad fusion_method / biattention ids assert
for bad_kw in ({"fusion_method": "bogus"}, {"t_biattention_id": (2, 99)}):
    try:
        break_cfg = cfg.replace(**bad_kw)
        unimm.forward_eval(vilbert.init_params(jax.random.PRNGKey(0), break_cfg),
                           break_cfg,
                           {k: jnp.asarray(v) for k, v in batch.items()},
                           dtype=jnp.float32)
        raise SystemExit("expected assertion for " + str(bad_kw))
    except (AssertionError, KeyError, IndexError) as e:
        print("probe asserts ok:", type(e).__name__)

# --- changed surface this session: prefix scorer, single- and sharded mesh ---
from unimm_tpu.eval.evaluator import RankingEvaluator
from unimm_tpu.data.dataset import flatten_for_forward
from unimm_tpu.parallel import mesh as pmesh

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))
from bench_workload import make_val_batch  # noqa: E402  (canonical slates)


def gen_slates(rng, B, Rn, O):
    return make_val_batch(rng, cfg, B, Rn, O, ctx_range=(8, 20),
                          ans_range=(2, 5), feat_dim=cfg.v_feature_size)


slates = gen_slates(np.random.default_rng(3), 2, 2, 5)
for mesh in (None, pmesh.make_mesh(8, mp=2)):
    ev = RankingEvaluator(cfg, chunk_size=4, dtype=jnp.float32,
                          need_lm=True, need_nsp=False, mesh=mesh,
                          prefix_group=2)
    assert ev._prefix is not None
    ps = ev.score_slates(params, slates)
    fs = ev.score_flat(params, flatten_for_forward(slates, train=False,
                                                   compact_images=True))
    np.testing.assert_allclose(ps["ll_sum"], fs["ll_sum"], rtol=2e-4, atol=2e-4)
    print("prefix == flat ok, mesh =", mesh and dict(mesh.shape))

print("VERIFY OK")

# --- changed surface this session: pipelined (async) eval loop ---
# 1) async == sync on an all-eligible batch
ev = RankingEvaluator(cfg, chunk_size=4, dtype=jnp.float32,
                      need_lm=True, need_nsp=False, prefix_group=2)
sync = ev.score_slates(params, slates)
fin = ev.score_slates_async(params, slates)
pipe = fin()
for k in sync:
    np.testing.assert_array_equal(sync[k], pipe[k])
print("async == sync (eligible slates) ok")

# 2) ineligible slates (dis-mode options) route through the flat fallback
#    inside finalize — async must still equal sync
mixed = gen_slates(np.random.default_rng(5), 2, 2, 5)
mixed["mode"][0, 0] = 0          # one dis-mode slate -> ineligible
mixed["ans_len"][0, 0] = 0
ms = ev.score_slates(params, mixed)
mp = ev.score_slates_async(params, mixed)()
for k in ms:
    np.testing.assert_array_equal(ms[k], mp[k])
print("async == sync (mixed eligibility fallback) ok")

# 3) the production evaluate_split loop (one batch in flight) end to end:
#    metrics finite, gt ranks recorded, same metrics as a re-run
from unimm_tpu.eval.evaluator import evaluate_split

def add_gt(b):
    b = dict(b)
    Bn, Rn, O = b["tokens"].shape[:3]
    b["gt_option_inds"] = np.zeros((Bn, Rn), np.int32)
    b["round_id"] = np.ones((Bn,), np.int32)
    b["gt_relevance"] = np.random.default_rng(0).random((Bn, O)).astype(np.float32)
    return b

val_batches = [add_gt(gen_slates(np.random.default_rng(7 + i), 2, 2, 5))
               for i in range(3)]
m1 = evaluate_split(params, cfg, list(val_batches), mode="ll_sum",
                    chunk_size=4, dtype=jnp.float32, progress_every=100,
                    log=lambda *a: None)
m2 = evaluate_split(params, cfg, list(val_batches), mode="ll_sum",
                    chunk_size=4, dtype=jnp.float32, progress_every=100,
                    log=lambda *a: None)
assert all(np.isfinite(v) for v in m1.values()), m1
assert m1 == m2, (m1, m2)
print("evaluate_split pipelined ok:", {k: round(v, 4) for k, v in m1.items()})

print("VERIFY OK (incl. pipelined eval)")

# --- changed surface: pipelined evaluate_ensemble ---
from unimm_tpu.eval.evaluator import evaluate_ensemble, minmax_per_slate

params2 = vilbert.init_params(jax.random.PRNGKey(9), cfg)
ranks = []
em = evaluate_ensemble([params, params2], cfg,
                       [add_gt(dict(b, image_id=np.arange(2, dtype=np.int64)))
                        for b in val_batches],
                       mode="ll_sum", chunk_size=4, dtype=jnp.float32,
                       ranks_out=ranks, log=lambda *a: None)
assert all(np.isfinite(v) for v in em.values()), em
assert len(ranks) == 3 * 2 * 2, len(ranks)
# oracle: ensemble total == sum of per-model minmax-normalised score_slates
ev1 = RankingEvaluator(cfg, chunk_size=4, dtype=jnp.float32,
                       need_lm=True, need_nsp=False)
b0 = val_batches[0]
t = sum(minmax_per_slate(
        ev1.score_slates(p, b0)["ll_sum"].reshape(2, 2, 5))
        for p in (params, params2))
import unimm_tpu.ops.metrics as M
r0 = np.asarray(M.scores_to_ranks(t))
assert ranks[0]["ranks"] == [int(x) for x in r0[0, 0]], "ensemble rank oracle"
print("evaluate_ensemble pipelined ok:", {k: round(v, 4)
                                          for k, v in list(em.items())[:5]})
print("VERIFY OK (incl. ensemble)")
