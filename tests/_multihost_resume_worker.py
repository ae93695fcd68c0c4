"""Worker for the 2-process save -> fresh restore -> resume test
(spawned twice by test_multihost.py::test_multiprocess_restore_resumes).

phase 'save'    — init, train step on batch 1, rank-0 native full-state save
                  (leaf-wise gather_to_host), then step on batch 2 and print
                  the never-interrupted METRICS2.
phase 'restore' — FRESH processes: restore the native full state (params +
                  Adam moments + step + rng), re-place onto the mesh
                  shardings exactly like cli/train.py -continue, run the
                  same batch-2 step and print METRICS2. The parent asserts
                  both phases' METRICS2 are identical: resume is bitwise
                  transparent under the multi-host layer
                  (/root/reference/train.py:351-389 resume semantics).
"""

import os
import sys

rank = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
ckpt_dir = sys.argv[4]
phase = sys.argv[5]

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
from unimm_tpu import checkpoint as C  # noqa: E402
from unimm_tpu.models import vilbert  # noqa: E402
from unimm_tpu.parallel import mesh as pmesh  # noqa: E402
from unimm_tpu.train import optim, step as tstep  # noqa: E402

mesh = pmesh.make_mesh(2 * nproc, mp=2)
cfg = dryrun_config()
params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
params, _ = pmesh.shard_params(params, mesh)
tx = optim.make_optimizer(params, optim.OptimConfig(batch_multiply=1,
                                                    warmup_steps=10,
                                                    t_total=100))
state = tstep.init_state(params, tx, seed=0)
train_step = tstep.make_train_step(cfg, tx, dtype=jnp.float32, donate=False)

B = 8
k = B // nproc


def local(seed):
    full = {key: np.asarray(v) for key, v in _synthetic_batch(
        np.random.default_rng(seed), cfg, B, train=True).items()}
    return pmesh.shard_batch(
        {key: v[rank * k:(rank + 1) * k] for key, v in full.items()}, mesh)


nw = jnp.asarray([1.0, 1.0])
batch1, batch2 = local(11), local(12)
compiled = train_step.lower(state, batch1, nw).compile()
# the AOT executable demands EXACT input shardings; step outputs (and
# restored leaves) are re-placed onto the init-state template shardings
tmpl_shardings = jax.tree_util.tree_map(lambda x: x.sharding, state)


def replace_onto_template(values):
    return jax.tree_util.tree_map(
        lambda s, v: jax.device_put(v, s) if isinstance(
            s, jax.sharding.NamedSharding) else jnp.asarray(v),
        tmpl_shardings, values)


try:
    from jax._src.distributed import global_state
    global_state.client.wait_at_barrier(f"compiled_{phase}", 300_000)
except Exception as e:
    print("barrier unavailable:", e, flush=True)

if phase == "save":
    state, _ = compiled(state, batch1, nw)
    state = replace_onto_template(state)
    host_state = pmesh.gather_to_host(state, mesh)
    # EVERY process calls the orbax save (its protocol barriers across
    # processes; orbax writes from the primary only) — same as cli/train.py
    C.save_native(ckpt_dir, host_state, int(np.asarray(state["step"])))
else:
    latest = C.latest_native(ckpt_dir)
    assert latest is not None, ckpt_dir
    host_state = C.restore_native(latest[0], jax.device_get(state))
    # cli/train.py -continue re-placement: sharded leaves back onto their
    # NamedShardings, scalars re-committed
    state = replace_onto_template(host_state)
    assert int(np.asarray(state["step"])) == 1

state, metrics = compiled(state, batch2, nw)
m = {key: float(v) for key, v in sorted(metrics.items())}
assert all(np.isfinite(v) for v in m.values()), m
print("METRICS2", rank, m, flush=True)
print("WORKER_OK", rank, flush=True)
