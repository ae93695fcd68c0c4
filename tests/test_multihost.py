"""Real multi-process (multi-host-shaped) training test.

Spawns 2 JAX processes (2 virtual CPU devices each) coordinated via
jax.distributed, runs tests/_multihost_worker.py in both, and asserts:

* the process-sharded DataLoader gives each process a disjoint half of every
  global batch (union = the global shuffle);
* one full sharded train step built from process-LOCAL rows via
  jax.make_array_from_process_local_data produces identical finite metrics on
  both processes, and those metrics match a single-process run of the SAME
  global batch on an equally-sized local mesh.

This is the capability the reference's DataParallel cannot provide (it is
single-process only, /root/reference/utils/data_parallel.py) and what
SURVEY §5 calls "multi-host via jax.distributed + DCN".
"""

import ast
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _parse(stdout, tag, rank):
    for line in stdout.splitlines():
        if line.startswith(f"{tag} {rank} "):
            return ast.literal_eval(line[len(f"{tag} {rank} "):])
    raise AssertionError(f"no '{tag} {rank}' line in:\n{stdout}")


@pytest.fixture(scope="module")
def worker_outputs(tmp_path_factory):
    port = _free_port()
    ckpt = str(tmp_path_factory.mktemp("mh") / "mh.ckpt")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 2-device count
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(rank), "2", str(port), ckpt],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for rank in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-4000:]
        assert "WORKER_OK" in out
    return outs, ckpt


@pytest.mark.slow
def test_loader_process_sharding_disjoint(worker_outputs):
    l0 = _parse(worker_outputs[0][0][1], "LOADER", 0)
    l1 = _parse(worker_outputs[0][1][1], "LOADER", 1)
    assert len(l0) == len(l1) == 2  # 16 items / global batch 8
    for b0, b1 in zip(l0, l1):
        assert len(b0) == len(b1) == 4  # half of the global batch each
        assert not set(b0) & set(b1)
    seen = sorted(x for b in l0 + l1 for x in b)
    assert seen == list(range(16))  # together they cover the global shuffle


@pytest.mark.slow
def test_multiprocess_step_matches_single_process(worker_outputs):
    m0 = _parse(worker_outputs[0][0][1], "METRICS", 0)
    m1 = _parse(worker_outputs[0][1][1], "METRICS", 1)
    assert m0.keys() == m1.keys()
    for k in m0:
        assert abs(m0[k] - m1[k]) < 1e-6, (k, m0[k], m1[k])

    # ground truth: the same GLOBAL batch on a single-process 4-device mesh
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch, dryrun_config
    from unimm_tpu.models import vilbert
    from unimm_tpu.parallel import mesh as pmesh
    from unimm_tpu.train import optim, step as tstep

    mesh = pmesh.make_mesh(4, mp=2)
    cfg = dryrun_config()
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    params, _ = pmesh.shard_params(params, mesh)
    tx = optim.make_optimizer(params, optim.OptimConfig(batch_multiply=1,
                                                        warmup_steps=10,
                                                        t_total=100))
    state = tstep.init_state(params, tx, seed=0)
    step = tstep.make_train_step(cfg, tx, dtype=jnp.float32)
    full = _synthetic_batch(np.random.default_rng(1), cfg, 8, train=True)
    _, metrics = step(state, pmesh.shard_batch(full, mesh),
                      jnp.asarray([1.0, 1.0]))
    for k, v in metrics.items():
        if k == "label_budget_overflow":
            continue
        assert abs(float(v) - m0[k]) < 1e-4, (k, float(v), m0[k])


@pytest.mark.slow
def test_multiprocess_eval_scores_agree(worker_outputs):
    """Multi-host sharded eval: per-process chunk slices assemble into the
    global batch, and the replicated score vectors agree across processes."""
    e0 = _parse(worker_outputs[0][0][1], "EVAL", 0)
    e1 = _parse(worker_outputs[0][1][1], "EVAL", 1)
    assert len(e0) == len(e1) == 8
    import numpy as np
    np.testing.assert_allclose(e0, e1, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_multiprocess_prefix_scores_agree(worker_outputs):
    """Multi-host prefix-cache scoring: every process stages the same global
    grouping, contributes its dp-block, and the replicated scores agree
    across processes (the worker itself asserts prefix == flat)."""
    p0 = _parse(worker_outputs[0][0][1], "PREFIX", 0)
    p1 = _parse(worker_outputs[0][1][1], "PREFIX", 1)
    assert len(p0) == len(p1) == 12  # 3 slates x 4 options
    np.testing.assert_allclose(p0, p1, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_multiprocess_pipelined_scores_agree(worker_outputs):
    """One-batch-in-flight async scoring under 2 processes: the interleaved
    dispatch order is identical on every process and the results equal the
    sync path (the worker asserts async == sync per process)."""
    q0 = _parse(worker_outputs[0][0][1], "PIPELINE", 0)
    q1 = _parse(worker_outputs[0][1][1], "PIPELINE", 1)
    assert len(q0) == len(q1) == 12
    np.testing.assert_allclose(q0, q1, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_multiprocess_save_and_guard(worker_outputs):
    """Rank 0 alone writes the gathered checkpoint (gather_to_host), and
    the multi-process shard_batch guard rejects non-divisible arrays."""
    outs, ckpt = worker_outputs
    assert _parse(outs[0][1], "SAVED", 0) == 1
    assert _parse(outs[1][1], "SAVED", 1) == 0
    assert _parse(outs[0][1], "GUARD", 0) == "ok"
    assert _parse(outs[1][1], "GUARD", 1) == "ok"
    assert os.path.exists(ckpt)
    import torch
    blob = torch.load(ckpt, map_location="cpu", weights_only=False)
    assert blob["iter_id"] == 1 and "model_state_dict" in blob


RESUME_WORKER = os.path.join(REPO, "tests", "_multihost_resume_worker.py")


def _run_resume_phase(phase, port, ckpt_dir):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, RESUME_WORKER, str(rank), "2", str(port), ckpt_dir,
         phase],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for rank in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-4000:]
        assert "WORKER_OK" in out
    return outs


@pytest.mark.slow
def test_multiprocess_restore_resumes(tmp_path):
    """2-process native save -> FRESH 2-process restore -> the next step's
    metrics equal the never-interrupted run (multi-host failure/resume:
    reference train.py:351-389 semantics under the jax.distributed layer)."""
    ckpt_dir = str(tmp_path / "native")
    save_outs = _run_resume_phase("save", _free_port(), ckpt_dir)
    rest_outs = _run_resume_phase("restore", _free_port(), ckpt_dir)
    m_save = _parse(save_outs[0][1], "METRICS2", 0)
    m_rest = _parse(rest_outs[0][1], "METRICS2", 0)
    assert m_save.keys() == m_rest.keys()
    for k in m_save:
        assert abs(m_save[k] - m_rest[k]) < 1e-6, (k, m_save[k], m_rest[k])
    # both restore processes agree with each other too
    m_rest1 = _parse(rest_outs[1][1], "METRICS2", 1)
    for k in m_rest:
        assert abs(m_rest[k] - m_rest1[k]) < 1e-6


EVAL_WORKER = os.path.join(REPO, "tests", "_multihost_eval_worker.py")


@pytest.mark.slow
def test_eval_tail_padding_two_process():
    """Data-sharded 2-process eval with a NON-divisible tail (5 slates at
    global batch 2): the loader pads the 1-row tail instead of dropping it,
    every dialog is scored exactly once as a valid row, and the
    process-merged metrics equal a single-process run over the whole split
    (computed here in the parent — the reference scores every val dialog,
    val_lm.py:40-190)."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, EVAL_WORKER, str(rank), "2", str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for rank in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-4000:]
        assert "EVALW_OK" in out

    # coverage: together the processes load every dialog (the tail row
    # included); the padded duplicate adds a second load of index 4
    s0 = set(_parse(outs[0][1], "SERVED", 0))
    s1 = set(_parse(outs[1][1], "SERVED", 1))
    assert s0 | s1 == set(range(5)), (s0, s1)
    # ranks_out holds only VALID rows: 5 slates x 2 rounds total
    n0 = _parse(outs[0][1], "RANKSN", 0)
    n1 = _parse(outs[1][1], "RANKSN", 1)
    assert n0 + n1 == 5 * 2, (n0, n1)
    # every process returns the same GLOBAL metrics
    m0 = _parse(outs[0][1], "MERGED", 0)
    m1 = _parse(outs[1][1], "MERGED", 1)
    assert m0.keys() == m1.keys()
    for k in m0:
        assert abs(m0[k] - m1[k]) < 1e-9, (k, m0[k], m1[k])
    # ... equal to a single-process run over the whole split, computed here
    # in the parent (running it inside a distributed worker would skew the
    # processes past the coordination-service shutdown deadline)
    import jax.numpy as jnp

    from tests._slate_fixture import SlateDataset, collate, make_split
    from __graft_entry__ import dryrun_config
    from unimm_tpu.data.loader import DataLoader
    from unimm_tpu.eval.evaluator import evaluate_split
    from unimm_tpu.models import vilbert

    cfg = dryrun_config()
    import jax
    ds = SlateDataset(make_split(cfg, 5, 2, 4), 5)
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    ld = DataLoader(ds, 2, shuffle=False, num_workers=2, collate_fn=collate)
    single = evaluate_split(params, cfg, ld, mode="ll_sum",
                            dtype=jnp.float32, chunk_size=4,
                            progress_every=0)
    assert set(single) == set(m0), (sorted(single), sorted(m0))
    bad = {k: (single[k], m0[k]) for k in single
           if abs(single[k] - m0[k]) > 2e-6}   # MERGED printed at 6 decimals
    assert not bad, bad

    # merged predictions file: rank 0 wrote ONE file covering every valid
    # (dialog, round) exactly once — the reference's single save_name dump
    import json
    with open(f"/tmp/mh_ranks_{port}.json") as f:
        merged_ranks = json.load(f)
    assert len(merged_ranks) == 5 * 2
    pairs = {(e["image_id"], e["round_id"]) for e in merged_ranks}
    assert len(pairs) == 10 and all(len(e["ranks"]) == 4
                                    for e in merged_ranks)

    # zero-valid-rows process (global batch 1 padded over 2 processes:
    # rank 1 only ever sees duplicates): merge still returns the global
    # metrics on BOTH processes and the progress log printed every batch
    z0 = _parse(outs[0][1], "MERGED0", 0)
    z1 = _parse(outs[1][1], "MERGED0", 1)
    assert z0.keys() == z1.keys() and z0, (sorted(z0), sorted(z1))
    for k in z0:
        assert abs(z0[k] - z1[k]) < 1e-9, (k, z0[k], z1[k])
    # progress accounting counts LOADER batches, one line per consumed
    # dispatch group: 3 batches at the -eval_coalesce 2 default -> groups of
    # (2, 1) -> 2 lines, the last reporting all 3 batches
    assert _parse(outs[0][1], "LOGN", 0) == 2
    assert _parse(outs[1][1], "LOGN", 1) == 2
    assert _parse(outs[0][1], "LOGLAST", 0) == 3
    assert _parse(outs[1][1], "LOGLAST", 1) == 3
    ds3 = SlateDataset(make_split(cfg, 3, 2, 4), 3)
    ld3 = DataLoader(ds3, 1, shuffle=False, num_workers=2,
                     collate_fn=collate)
    single3 = evaluate_split(params, cfg, ld3, mode="ll_sum",
                             dtype=jnp.float32, chunk_size=4,
                             progress_every=0)
    bad = {k: (single3[k], z0[k]) for k in single3
           if abs(single3[k] - z0[k]) > 2e-6}
    assert not bad, bad

    # data-sharded eval over a LOCAL 2-device dp mesh equals the no-mesh
    # sharded run (cli/val_lm.py's -eval_data_sharded multi-chip-host path)
    L0 = _parse(outs[0][1], "MERGEDL", 0)
    L1 = _parse(outs[1][1], "MERGEDL", 1)
    assert L0.keys() == L1.keys() == m0.keys()
    for k in L0:
        assert abs(L0[k] - L1[k]) < 1e-9, (k, L0[k], L1[k])
        assert abs(L0[k] - m0[k]) < 2e-6, (k, L0[k], m0[k])

    # --- data-sharded ENSEMBLE eval (discriminative nsp mode, 2 models,
    # coalesce 2, pipeline 2) with the same non-divisible tail: every slate
    # served, every (dialog, round) ranked exactly once across processes,
    # process-merged metrics equal a single-process ensemble run
    s0 = set(_parse(outs[0][1], "SERVEDE", 0))
    s1 = set(_parse(outs[1][1], "SERVEDE", 1))
    assert s0 | s1 == set(range(5)), (s0, s1)
    ne0 = _parse(outs[0][1], "RANKSE", 0)
    ne1 = _parse(outs[1][1], "RANKSE", 1)
    assert ne0 + ne1 == 5 * 2, (ne0, ne1)
    E0 = _parse(outs[0][1], "MERGEDE", 0)
    E1 = _parse(outs[1][1], "MERGEDE", 1)
    assert E0.keys() == E1.keys() == m0.keys()
    for k in E0:
        assert abs(E0[k] - E1[k]) < 1e-9, (k, E0[k], E1[k])
    from unimm_tpu.eval.evaluator import evaluate_ensemble
    params2 = vilbert.init_params(jax.random.PRNGKey(1), cfg)
    ds_e = SlateDataset(make_split(cfg, 5, 2, 4), 5)
    ld_e = DataLoader(ds_e, 2, shuffle=False, num_workers=2,
                      collate_fn=collate)
    single_e = evaluate_ensemble([params, params2], cfg, ld_e, mode="nsp",
                                 dtype=jnp.float32, chunk_size=4,
                                 progress_every=0)
    assert set(single_e) == set(E0), (sorted(single_e), sorted(E0))
    bad = {k: (single_e[k], E0[k]) for k in single_e
           if abs(single_e[k] - E0[k]) > 2e-6}
    assert not bad, bad
    with open(f"/tmp/mh_ranks_ens_{port}.json") as f:
        merged_e = json.load(f)
    assert len(merged_e) == 5 * 2
    pairs_e = {(e["image_id"], e["round_id"]) for e in merged_e}
    assert len(pairs_e) == 10 and all(len(e["ranks"]) == 4
                                      for e in merged_e)

    # --- dump_ranks_merged with asymmetric per-entry option counts: true
    # lengths are preserved (no spurious rank-0 padding entries)
    with open(f"/tmp/mh_ranks_asym_{port}.json") as f:
        asym = json.load(f)
    assert [(e["image_id"], len(e["ranks"])) for e in asym] == \
        [(7, 4), (8, 4), (9, 2)], asym
    assert asym[2]["ranks"] == [1, 2]


MORSEL_WORKER = os.path.join(REPO, "tests", "_multihost_morsel_worker.py")


@pytest.mark.slow
def test_morsels_multiprocess_match_unsorted():
    """2-process length-bucketed morsels (local sort + allgathered bucket
    lengths + group loss normalisers) produce the SAME summed accumulation
    gradient as the unsorted group (asserted through an SGD update delta —
    see the worker docstring for why not AdamW) — the 502 ms/step morsel
    recipe is multi-host-valid (reference grad-accumulation semantics,
    train.py:451-460). Also asserts both processes trace identical morsel
    shapes (one jit cache entry)."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, MORSEL_WORKER, str(rank), "2", str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for rank in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, err[-4000:]
        assert "WORKER_OK" in out
    # every process traced the same (synced) morsel bucket shapes
    sh0 = _parse(outs[0][1], "SHAPES", 0)
    sh1 = _parse(outs[1][1], "SHAPES", 1)
    assert sh0 == sh1, (sh0, sh1)
    # parity asserted in-worker (<1e-3 floored norm ratio); surface it
    for rank in range(2):
        assert _parse(outs[rank][1], "PARITY", rank) < 1e-3
