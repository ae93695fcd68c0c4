"""Worker for the 2-process multi-host test (spawned by test_multihost.py).

Each process: 2 virtual CPU devices -> a 4-device global dp x mp mesh, a
process-sharded DataLoader, and one full sharded training step fed by
jax.make_array_from_process_local_data (no host-global arrays). Prints
LOADER/METRICS lines the parent asserts on.
"""

import os
import sys

rank = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=rank)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import _synthetic_batch, dryrun_config  # noqa: E402
from unimm_tpu.data.loader import DataLoader  # noqa: E402
from unimm_tpu.models import vilbert  # noqa: E402
from unimm_tpu.parallel import mesh as pmesh  # noqa: E402
from unimm_tpu.train import optim, step as tstep  # noqa: E402

assert len(jax.devices()) == 2 * nproc
assert jax.process_index() == rank


# ---- 1. process-sharded loader: disjoint halves of each global batch ----
class Toy:
    def __len__(self):
        return 16

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.int32)}


ld = DataLoader(Toy(), 8, shuffle=True, seed=3, num_workers=2,
                collate_fn=lambda its: {"x": np.stack([t["x"] for t in its])},
                process_index=rank, process_count=nproc)
got = [b["x"][:, 0].tolist() for b in ld]
print("LOADER", rank, got, flush=True)

# ---- 2. one sharded train step from process-local rows ----
mesh = pmesh.make_mesh(2 * nproc, mp=2)
assert pmesh.mesh_process_count(mesh) == nproc

cfg = dryrun_config()
params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
params, _ = pmesh.shard_params(params, mesh)
tx = optim.make_optimizer(params, optim.OptimConfig(batch_multiply=1,
                                                    warmup_steps=10,
                                                    t_total=100))
state = tstep.init_state(params, tx, seed=0)
train_step = tstep.make_train_step(cfg, tx, dtype=jnp.float32)

B = 8  # global; each process contributes B // nproc contiguous rows
full = {k: np.asarray(v)
        for k, v in _synthetic_batch(np.random.default_rng(1), cfg, B,
                                     train=True).items()}
k = B // nproc
local = {key: v[rank * k:(rank + 1) * k] for key, v in full.items()}
batch = pmesh.shard_batch(local, mesh)
nw = jnp.asarray([1.0, 1.0])
# AOT-compile BEFORE the host barrier: Gloo's first-collective rendezvous has
# a 30s deadline, and a compile-cache hit on one process but not the other
# skews arrival past it (observed flake). With both processes compiled and
# then barrier-synced, the rendezvous is immediate.
compiled = train_step.lower(state, batch, nw).compile()
try:
    from jax._src.distributed import global_state
    global_state.client.wait_at_barrier("compiled", 300_000)
except Exception as e:  # barrier API moved: fall back to generous timeout
    print("barrier unavailable:", e, flush=True)
state, metrics = compiled(state, batch, nw)
m = {key: float(v) for key, v in sorted(metrics.items())}
assert all(np.isfinite(v) for v in m.values()), m
print("METRICS", rank, m, flush=True)

# ---- 3. multi-host eval: identical host data, per-process chunk slices ----
from unimm_tpu.eval.evaluator import RankingEvaluator  # noqa: E402

ev = RankingEvaluator(cfg, chunk_size=4, dtype=jnp.float32,
                      need_lm=True, need_nsp=True, mesh=mesh)
eval_full = {k: np.asarray(v)
             for k, v in _synthetic_batch(np.random.default_rng(7), cfg,
                                          8).items()}
# exercise the COMPACT image path (the production evaluate_split layout):
# 2 unique images stored once, img_index maps each sequence to its image
for key in ("image_feat", "image_loc", "image_mask"):
    eval_full[key] = eval_full[key][:2]
eval_full["img_index"] = np.repeat(np.arange(2, dtype=np.int32), 4)
scores = ev.score_flat(state["params"], eval_full)
assert scores["ll_sum"].shape == (8,)
assert np.isfinite(scores["ll_sum"]).all()
assert np.isfinite(scores["nsp_prob"]).all()
print("EVAL", rank, [round(float(x), 4) for x in scores["ll_sum"]],
      flush=True)

# ---- 3b. multi-host prefix-cache scoring: same grouping on every process,
# dp-block contribution per group, replicated scores == flat path ----
def _gen_slates(rng, cfg, B, R, O):
    """Tiny shared-context gen slates (encode_gen layout, bench.py shapes)."""
    L, Rg = cfg.max_seq_len, cfg.max_regions
    toks = np.zeros((B, R, O, L), np.int32)
    segs = np.zeros((B, R, O, L), np.int32)
    labs = np.full((B, R, O, L), -1, np.int32)
    ce = np.zeros((B, R, O), np.int32)
    al = np.zeros((B, R, O), np.int32)
    for b in range(B):
        for r in range(R):
            lc = int(rng.integers(8, 20))
            ctx = rng.integers(1, cfg.vocab_size, lc).astype(np.int32)
            cs = rng.integers(0, 2, lc).astype(np.int32)
            for o in range(O):
                a = int(rng.integers(2, 5))
                ans = rng.integers(1, cfg.vocab_size, a).astype(np.int32)
                toks[b, r, o, :lc] = ctx
                segs[b, r, o, :lc] = cs
                t1, t2 = lc + a, min(lc + 2 * a, L)
                toks[b, r, o, lc:t1] = ans
                toks[b, r, o, t1:t2] = ans[:t2 - t1]
                labs[b, r, o, t1:t2] = ans[:t2 - t1]
                ce[b, r, o], al[b, r, o] = t1, a
    return {
        "tokens": toks, "segments": segs,
        "mode": np.ones((B, R, O), np.int32),
        "ctx_end": ce, "ans_len": al, "mlm_labels": labs,
        "image_feat": rng.normal(
            size=(B, Rg, cfg.v_feature_size)).astype(np.float32),
        "image_loc": rng.normal(size=(B, Rg, 5)).astype(np.float32),
        "image_mask": np.ones((B, Rg), np.float32),
    }


from unimm_tpu.data.dataset import flatten_for_forward  # noqa: E402

slates = _gen_slates(np.random.default_rng(11), cfg, B=1, R=3, O=4)
ev_lm = RankingEvaluator(cfg, chunk_size=4, dtype=jnp.float32,
                         need_lm=True, need_nsp=False, mesh=mesh,
                         prefix_group=2)
assert ev_lm._prefix is not None and ev_lm._prefix._nproc == nproc
pscores = ev_lm.score_slates(state["params"], slates)
flat_scores = ev_lm.score_flat(
    state["params"], flatten_for_forward(slates, train=False,
                                         compact_images=True))
np.testing.assert_allclose(pscores["ll_sum"], flat_scores["ll_sum"],
                           rtol=2e-4, atol=2e-4)
print("PREFIX", rank, [round(float(x), 4) for x in pscores["ll_sum"]],
      flush=True)

# ---- 3c. pipelined (one-batch-in-flight) scoring multi-process: batch 2 is
# dispatched on every process before batch 1 is finalized — enqueue order of
# the sharded programs stays identical across processes, results == sync ----
slates2 = _gen_slates(np.random.default_rng(13), cfg, B=1, R=3, O=4)
fin1 = ev_lm.score_slates_async(state["params"], slates)
fin2 = ev_lm.score_slates_async(state["params"], slates2)
pipe1, pipe2 = fin1(), fin2()
np.testing.assert_array_equal(pipe1["ll_sum"], pscores["ll_sum"])
np.testing.assert_allclose(pipe2["ll_sum"],
                           ev_lm.score_slates(state["params"],
                                              slates2)["ll_sum"],
                           rtol=0, atol=0)
print("PIPELINE", rank, [round(float(x), 4) for x in pipe2["ll_sum"]],
      flush=True)

# ---- 4. multi-host checkpoint save: gather shards, rank 0 writes ----
from unimm_tpu import checkpoint as C  # noqa: E402

host_state = pmesh.gather_to_host(state, mesh)
ckpt_path = sys.argv[4]
if jax.process_index() == 0:
    C.save_reference_ckpt(ckpt_path, host_state["params"], 1)
print("SAVED", rank, int(jax.process_index() == 0), flush=True)

# ---- 5. shard_batch multi-process guard: non-divisible must raise ----
# (needs dp=4: on the dp=2 mesh every gdim = 2*local is divisible)
mesh_dp4 = pmesh.make_mesh(2 * nproc, mp=1)
try:
    pmesh.shard_batch({"bad": np.zeros((1, 2), np.float32)}, mesh_dp4)
    print("GUARD", rank, "'missing'", flush=True)
except ValueError:
    print("GUARD", rank, "'ok'", flush=True)
print("WORKER_OK", rank, flush=True)
