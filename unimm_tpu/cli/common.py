"""Shared CLI wiring: config/tokenizer/reader/model/checkpoint setup."""

from __future__ import annotations

import os
from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from unimm_tpu import checkpoint as C
from unimm_tpu.config import VilbertConfig
from unimm_tpu.data import features
from unimm_tpu.data.tokenizer import WordPieceTokenizer
from unimm_tpu.models import vilbert


def setup_jax(params: dict):
    cache = os.environ.get("UNIMM_JAX_CACHE", "/tmp/unimm_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    # multi-host slices: one process per host, mesh spans all hosts, data
    # parallel rides ICI within a slice and DCN across slices
    if params.get("coordinator_address"):
        jax.distributed.initialize(
            coordinator_address=params["coordinator_address"],
            num_processes=params["num_processes"] or None,
            process_id=(params["process_id"]
                        if params["process_id"] >= 0 else None))


def build_config(params: dict) -> VilbertConfig:
    cfg = VilbertConfig.from_json_file(params["model_config"])
    return cfg.replace(max_seq_len=params["max_seq_len"],
                       attention_impl=params.get("attention_impl",
                                                 "pallas_block"),
                       remat=bool(params.get("remat", 0)))


def mesh_device_count(params: dict) -> int:
    """-n_gpus semantics (reference options.py:58 'number of gpus running the
    job'): a positive value is the mesh device count; 0 (our default) means
    all local devices."""
    n = int(params.get("n_gpus", 0) or 0)
    avail = len(jax.devices())
    if n <= 0:
        return avail
    assert n <= avail, f"-n_gpus {n} > {avail} available devices"
    return n


def eval_mesh(params: dict):
    """Mesh over the -n_gpus-selected devices for sharded eval (None when a
    single device is selected). Honors -mesh_mp: a dp x mp mesh with
    tensor-parallel param sharding."""
    n = mesh_device_count(params)
    if n > 1:
        from unimm_tpu.parallel import mesh as pmesh
        return pmesh.make_mesh(n, mp=params.get("mesh_mp", 1) or 1)
    return None


def sharded_eval_setup(params: dict, dataset, batch_size: int):
    """(loader, mesh, sharded) for an eval entry point.

    With ``-eval_data_sharded`` under multi-process JAX each process scores
    a DISJOINT shard of the split on its LOCAL devices (non-divisible tails
    padded + masked by the loader; metrics allgather-merged by the caller
    via process_merge) — throughput scales with hosts. Default: replicated
    loader over the one global -n_gpus mesh (every process iterates the
    whole split, like the reference's single-process eval)."""
    from unimm_tpu.data.loader import DataLoader

    nproc, rank = jax.process_count(), jax.process_index()
    sharded = nproc > 1 and bool(params.get("eval_data_sharded"))
    loader = DataLoader(dataset, batch_size, shuffle=False,
                        num_workers=params["num_workers"],
                        process_index=rank if sharded else 0,
                        process_count=nproc if sharded else 1)
    if sharded:
        # each process computes independently on its OWN chips — a local
        # dp mesh spreads its shard over every addressable device instead
        # of idling all but device 0 (single local device: no mesh needed)
        from unimm_tpu.parallel import mesh as pmesh
        mesh = pmesh.local_mesh() if len(jax.local_devices()) > 1 else None
    else:
        mesh = eval_mesh(params)
    return loader, mesh, sharded


def place_params_for_eval(model_params, mesh):
    """Commit eval params onto the eval mesh (replicated over dp, sharded
    over mp). Without this, params restored from a native Orbax directory
    arrive committed to device 0 and conflict with dp-sharded eval chunks."""
    if mesh is None:
        return model_params
    from unimm_tpu.parallel import mesh as pmesh
    placed, _ = pmesh.shard_params(model_params, mesh)
    return placed


class StepProfiler:
    """Traces a window of steps with jax.profiler when -profile_dir is set
    (the reference's only timing is wall-clock prints, train.py:466-488)."""

    def __init__(self, directory: str, start: int = 10, stop: int = 15):
        self.dir = directory
        self.start, self.stop = start, stop
        self._active = False

    def step(self, i: int):
        if not self.dir:
            return
        if i == self.start and not self._active:
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif i >= self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace written to {self.dir}")

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def load_tokenizer(params: dict) -> WordPieceTokenizer:
    return WordPieceTokenizer.from_vocab_file(params["vocab_path"])


def open_reader(params: dict):
    return features.open_features(params["visdial_image_feats"])


def compute_dtype(params: dict):
    return jnp.bfloat16 if params.get("dtype", "bfloat16") == "bfloat16" \
        else jnp.float32


def init_model(params: dict, cfg: VilbertConfig):
    model_params = vilbert.init_params(
        jax.random.PRNGKey(params.get("seed", 0)), cfg)
    if params.get("start_path"):
        model_params = load_any_checkpoint(params["start_path"], model_params)
    return model_params


def load_any_checkpoint(path: str, template):
    """Load either a reference-format .ckpt or an Orbax directory."""
    if os.path.isdir(path):
        return C.restore_native(path, template)
    restored, iter_id, n, skipped = C.load_reference_ckpt(path, template)
    print(f"number of keys transferred {n}"
          + (f" (skipped {len(skipped)})" if skipped else ""))
    assert n > 0
    return restored


def load_ensemble(params: dict, template) -> List:
    paths = [p for p in params.get("model_paths", "").split(",") if p]
    if not paths and params.get("start_path"):
        paths = [params["start_path"]]
    assert paths, "provide -model_paths or -start_path"
    return [load_any_checkpoint(p, template) for p in paths]


def print_metrics(metrics: dict):
    for name, value in metrics.items():
        print(f"{name}: {value}")
