"""Worker for the 2-process length-bucketed-morsel test (spawned by
test_multihost.py::test_morsels_multiprocess_match_unsorted).

Each process holds the local half of a k=2 accumulation group. Path A runs
the group through length_bucket_morsels with the cross-process sync (local
sort, allgathered bucket lengths + group loss normalisers); path B runs the
same group UNSORTED with the same group-level normalisers. Both paths apply
one MultiSteps-accumulated SGD update from the same initial state, so each
path's parameter delta is exactly -lr * (mean accumulated gradient): the
deltas matching proves the summed micro-GRADIENTS are equal — the morsel
regrouping is exact, and the 502 ms/step morsel recipe is multi-host-valid
(reference grad-accumulation semantics, /root/reference/train.py:451-460).

SGD (not the production AdamW) is deliberate: Adam's update is sign-like
wherever the accumulated gradient is at rounding level (attention key
biases have mathematically ZERO gradient — softmax shift invariance), so a
post-Adam parameter comparison amplifies fp32 reassociation noise into
O(lr) diffs on near-zero entries. The claim under test is about gradients;
SGD exposes them linearly. Per-leaf metric: ||dA - dB|| relative to
max(||dB||, 1e-5 * global ||dB||) — the floor keeps zero-gradient leaves
(pure noise over noise) from dominating.
"""

import os
import sys

rank = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=rank)

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from __graft_entry__ import _synthetic_batch, dryrun_config  # noqa: E402
from unimm_tpu.data.dataset import length_bucket_morsels  # noqa: E402
from unimm_tpu.models import vilbert  # noqa: E402
from unimm_tpu.parallel import mesh as pmesh  # noqa: E402
from unimm_tpu.train import step as tstep  # noqa: E402


def barrier(name):
    try:
        from jax._src.distributed import global_state
        global_state.client.wait_at_barrier(name, 300_000)
    except Exception as e:
        print("barrier unavailable:", e, flush=True)


# align processes, then establish the Gloo context with a tiny first
# collective (its rendezvous has a ~30 s deadline; see _multihost_worker.py)
barrier("boot")
multihost_utils.process_allgather(np.zeros(1))

cfg = dataclasses.replace(
    dryrun_config(), hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0, v_hidden_dropout_prob=0.0,
    v_attention_probs_dropout_prob=0.0, head_dropout_prob=0.0)
K, BG = 2, 8                     # accumulation depth, global rows per flat
kloc = BG // nproc
mesh = pmesh.make_mesh(nproc, mp=1)
assert pmesh.mesh_process_count(mesh) == nproc

# host copies: run_group's donated train step would otherwise delete the
# device buffers that shard_params may ALIAS (device_put to the same local
# device is copy-free), breaking the second run_group
params0 = jax.tree_util.tree_map(
    np.asarray, vilbert.init_params(jax.random.PRNGKey(0), cfg))
import optax  # noqa: E402

tx = optax.MultiSteps(optax.sgd(1e-3), every_k_schedule=K)
train_step = tstep.make_train_step(cfg, tx, dtype=jnp.float32, mesh=mesh)
nw = jnp.asarray([1.0, 1.0])

# the same global flats on every process (shared seeds), sliced locally
flats_g = [
    {k: np.asarray(v)
     for k, v in _synthetic_batch(np.random.default_rng(10 + j), cfg, BG,
                                  train=True).items()}
    for j in range(K)]
locals_ = [{k: v[rank * kloc:(rank + 1) * kloc] for k, v in f.items()}
           for f in flats_g]
# GROUP-level loss normalisers (over all K flats, all processes): the lm /
# img / nsp denominators are all grouping-dependent, so both paths must use
# the same group-level values for the summed gradients to be comparable
# (unimm.forward_train consumes them; length_bucket_morsels computes the
# same three via its sync)
G = sum(float((f["lm_weight"] != 0).sum()) for f in flats_g)
IMG = sum(float((f["image_label"] == 1).sum()) for f in flats_g)
NSPC = np.array([sum(float((f["next_sentence_label"] == c).sum())
                     for f in flats_g) for c in (0, 1)], np.float32)


def run_group(micros, tag):
    pshard, _ = pmesh.shard_params(params0, mesh)
    state = tstep.init_state(pshard, tx, seed=0)
    for j, flat in enumerate(micros):
        sharded = pmesh.shard_batch(flat, mesh)
        compiled = train_step.lower(state, sharded, nw).compile()
        barrier(f"{tag}{j}")
        state, metrics = compiled(state, sharded, nw)
    m = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in m.values()), m
    return pmesh.gather_to_host(state["params"], mesh), m


def sync(stats):
    return np.asarray(multihost_utils.process_allgather(stats))


morsels = length_bucket_morsels(locals_, cfg.max_seq_len, K, sync=sync)
shapes = [tuple(m["tokens"].shape) for m in morsels]
print("SHAPES", rank, shapes, flush=True)
assert all(float(m["lm_norm"]) == G / K for m in morsels), \
    (G, [float(m["lm_norm"]) for m in morsels])
assert all(float(m["img_norm"]) == IMG / K for m in morsels)
assert all(np.array_equal(m["nsp_norm_counts"], NSPC / K) for m in morsels)
params_a, _ = run_group(morsels, "a")

unsorted = [dict(f, lm_norm=np.float32(G / K), img_norm=np.float32(IMG / K),
                 nsp_norm_counts=NSPC / K) for f in locals_]
params_b, _ = run_group(unsorted, "b")

db_all = jax.tree_util.tree_map(
    lambda b, p0: np.asarray(b, np.float64) - np.asarray(p0, np.float64),
    params_b, params0)
gnorm = float(np.sqrt(sum(float(np.sum(d * d))
                          for d in jax.tree_util.tree_leaves(db_all))))
assert gnorm > 0.0


def delta_diff(a, p0, db):
    da = np.asarray(a, np.float64) - np.asarray(p0, np.float64)
    return (float(np.linalg.norm(da - db))
            / max(float(np.linalg.norm(db)), 1e-5 * gnorm))


diffs = jax.tree_util.tree_map(delta_diff, params_a, params0, db_all)
worst = max(jax.tree_util.tree_leaves(diffs))
print("PARITY", rank, worst, flush=True)
assert worst < 1e-3, worst
print("WORKER_OK", rank, flush=True)
