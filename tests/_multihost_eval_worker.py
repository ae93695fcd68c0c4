"""Worker for the 2-process data-sharded eval test (spawned by
test_multihost.py::test_eval_tail_padding_two_process).

A 5-slate val split scored with a process-sharded DataLoader at global batch
2 (batches 2, 2, 1): the 1-row tail is NOT divisible by the 2 processes —
the loader pads it by duplicating the last row and flags the duplicate via
the per-batch ``valid`` mask. The worker proves (a) every dialog reaches a
process exactly once as a valid row, (b) evaluate_split masks the padding
out of metrics/ranks, and (c) both processes return identical process-merged
global metrics. The parent test compares them against a single-process run
over the whole split (the reference scores every val dialog unconditionally,
/root/reference/val_lm.py:40-190).
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

import jax.numpy as jnp  # noqa: E402

from tests._slate_fixture import SlateDataset, collate, make_split  # noqa: E402
from __graft_entry__ import dryrun_config  # noqa: E402
from unimm_tpu.data.loader import DataLoader  # noqa: E402
from unimm_tpu.eval.evaluator import evaluate_split  # noqa: E402
from unimm_tpu.models import vilbert  # noqa: E402

assert jax.process_index() == rank

cfg = dryrun_config()
N, R, O = 5, 2, 4
ds = SlateDataset(make_split(cfg, N, R, O), N)

params = vilbert.init_params(jax.random.PRNGKey(0), cfg)

loader = DataLoader(ds, 2, shuffle=False, num_workers=2,
                    collate_fn=collate,
                    process_index=rank, process_count=nproc)
assert len(loader) == 3  # no batch is dropped any more
ranks_out = []
merged = evaluate_split(params, cfg, loader, mode="ll_sum",
                        dtype=jnp.float32, chunk_size=4,
                        ranks_out=ranks_out, progress_every=0,
                        process_merge=True)
print("MERGED", rank,
      {k: round(float(v), 6) for k, v in sorted(merged.items())}, flush=True)
print("SERVED", rank, sorted(set(ds.served)), flush=True)
print("RANKSN", rank, len(ranks_out), flush=True)

# one merged predictions file from the disjoint shards (rank 0 writes)
from unimm_tpu.eval.evaluator import dump_ranks_merged  # noqa: E402

dump_ranks_merged(ranks_out, f"/tmp/mh_ranks_{port}.json")

# --- a process that observes ZERO valid rows: global batch 1 is padded to
# the 2 processes, so rank 1 only ever receives the duplicated row. Its
# accumulators stay empty — the progress log must not KeyError and
# allreduce_metrics must still merge to the global metrics.
ds0 = SlateDataset(make_split(cfg, 3, 2, 4), 3)
loader0 = DataLoader(ds0, 1, shuffle=False, num_workers=2,
                     collate_fn=collate,
                     process_index=rank, process_count=nproc)
logs = []
merged0 = evaluate_split(params, cfg, loader0, mode="ll_sum",
                         dtype=jnp.float32, chunk_size=4, progress_every=1,
                         log=logs.append, process_merge=True)
print("MERGED0", rank,
      {k: round(float(v), 6) for k, v in sorted(merged0.items())}, flush=True)
print("LOGN", rank, len(logs), flush=True)
# progress accounting counts LOADER batches (matches len(loader)), logged
# once per consumed dispatch group — the final line must report all 3
print("LOGLAST", rank, int(logs[-1].split()[2]), flush=True)

# --- data-sharded eval over a LOCAL 2-device dp mesh (what cli/val_lm.py
# builds under -eval_data_sharded on a multi-chip host): each process jits
# independently over its own devices; the merged metrics must be unchanged.
from unimm_tpu.parallel import mesh as pmesh  # noqa: E402

lmesh = pmesh.local_mesh()
assert lmesh.shape[pmesh.DP] == 2, dict(lmesh.shape)
params_l, _ = pmesh.shard_params(params, lmesh)
loader_l = DataLoader(ds, 2, shuffle=False, num_workers=2,
                      collate_fn=collate,
                      process_index=rank, process_count=nproc)
merged_l = evaluate_split(params_l, cfg, loader_l, mode="ll_sum",
                          dtype=jnp.float32, chunk_size=4, progress_every=0,
                          process_merge=True, mesh=lmesh)
print("MERGEDL", rank,
      {k: round(float(v), 6) for k, v in sorted(merged_l.items())},
      flush=True)

# --- data-sharded ENSEMBLE eval (the reference's second headline config is
# a multi-GPU discriminative ensemble, /root/reference/evaluate.py:27-132):
# same tail-padded 5-slate split, TWO models, nsp mode, coalesced + deep
# pipeline. Every dialog must be ranked exactly once and the process-merged
# metrics must equal a single-process ensemble run (checked by the parent).
from unimm_tpu.eval.evaluator import evaluate_ensemble  # noqa: E402

params2 = vilbert.init_params(jax.random.PRNGKey(1), cfg)
ds_e = SlateDataset(make_split(cfg, N, R, O), N)
loader_e = DataLoader(ds_e, 2, shuffle=False, num_workers=2,
                      collate_fn=collate,
                      process_index=rank, process_count=nproc)
ranks_e = []
merged_e = evaluate_ensemble([params, params2], cfg, loader_e, mode="nsp",
                             dtype=jnp.float32, chunk_size=4,
                             ranks_out=ranks_e, process_merge=True,
                             pipeline_depth=2, coalesce=2,
                             progress_every=0)
print("MERGEDE", rank,
      {k: round(float(v), 6) for k, v in sorted(merged_e.items())},
      flush=True)
print("SERVEDE", rank, sorted(set(ds_e.served)), flush=True)
print("RANKSE", rank, len(ranks_e), flush=True)
dump_ranks_merged(ranks_e, f"/tmp/mh_ranks_ens_{port}.json")

# --- dump_ranks_merged with ASYMMETRIC per-entry option counts across
# processes: the merged file must carry each entry's true length (no
# spurious rank-0 padding)
asym = ([{"image_id": 7, "round_id": 1, "ranks": [3, 1, 4, 2]},
         {"image_id": 8, "round_id": 1, "ranks": [2, 1, 3, 4]}]
        if rank == 0 else
        [{"image_id": 9, "round_id": 2, "ranks": [1, 2]}])
dump_ranks_merged(asym, f"/tmp/mh_ranks_asym_{port}.json")
print("EVALW_OK", rank, flush=True)
