"""Checkpoint naming, conversion, and persistence.

The parameter pytree in unimm_tpu.models.vilbert mirrors the reference
``state_dict`` structure, so torch-name <-> pytree-path mapping is mechanical:
join the path with '.', map the 'kernel' leaf of a Linear to '.weight'
(transposed). This module provides:

* bidirectional conversion with the reference checkpoint format
  (/root/reference/train.py:504-505: a dict with ``model_state_dict`` /
  ``optimizer_state_dict`` / ``scheduler_state_dict`` / ``iter_id``), including
  the legacy gamma/beta renames and ``bert_pretrained.`` prefix handling
  (vilbert_dialog.py:1234-1246, visual_dialog_encoder.py saved prefix);
* Orbax-based native checkpointing for the TPU training loop;
* name-based parameter grouping used by the two-LR optimizer
  (train.py:322-347 semantics driven by config/language_weights.json).

torch is imported lazily and only used for reading/writing the reference
.ckpt pickle format; the framework itself never depends on it.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

# Embedding tables whose torch '.weight' is NOT transposed (everything else
# ending in '.weight' on a 2-D tensor is a Linear kernel).
_EMBEDDING_LEAVES = {
    "word_embeddings", "position_embeddings", "token_type_embeddings",
    "token_type_embeddings_extension", "sep_embeddings",
}


def iter_param_items(params) -> List[Tuple[Tuple[str, ...], Any]]:
    out = []

    def rec(node, path):
        if isinstance(node, dict):
            for k in sorted(node):
                rec(node[k], path + (k,))
        else:
            out.append((path, node))

    rec(params, ())
    return out


def torch_name(path: Tuple[str, ...]) -> str:
    """Pytree path -> reference state_dict key."""
    path = list(path)
    if path[-1] == "kernel":
        path[-1] = "weight"
    elif path[-1] in _EMBEDDING_LEAVES:
        path.append("weight")
    return ".".join(path)


def name_map(params) -> Dict[str, Tuple[str, ...]]:
    """torch-name -> pytree path for every leaf."""
    return {torch_name(p): p for p, _ in iter_param_items(params)}


# ---------------------------------------------------------------------------
# torch state-dict conversion
# ---------------------------------------------------------------------------

def _normalize_key(k: str) -> str:
    """Strip wrapper prefixes and legacy names (vilbert_dialog.py:1234-1246)."""
    changed = True
    while changed:
        changed = False
        for prefix in ("module.", "bert_pretrained."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                changed = True
    k = k.replace(".gamma", ".weight").replace(".beta", ".bias")
    return k


def from_torch_state_dict(params_template, state_dict: Dict[str, Any],
                          strict: bool = False):
    """Build a params pytree from a torch-format state dict.

    Missing keys keep template values; extra keys are ignored (the reference
    loads by dict-intersection update, train.py:359-364). The tied
    ``cls.predictions.decoder.weight`` is ignored in favour of
    ``bert.embeddings.word_embeddings.weight``.
    """
    nm = name_map(params_template)
    params = jax.tree_util.tree_map(lambda x: x, params_template)

    def set_path(tree, path, value):
        for k in path[:-1]:
            tree = tree[k]
        tree[path[-1]] = value

    transferred, skipped = 0, []
    for raw_key, tensor in state_dict.items():
        key = _normalize_key(raw_key)
        if key == "cls.predictions.decoder.weight":
            continue  # tied to word embeddings
        if key not in nm:
            skipped.append(raw_key)
            continue
        arr = np.asarray(tensor, dtype=np.float32)
        path = nm[key]
        if path[-1] == "kernel":
            arr = arr.T
        tmpl = params
        for k in path:
            tmpl = tmpl[k]
        if tuple(arr.shape) != tuple(tmpl.shape):
            raise ValueError(
                f"shape mismatch for {key}: ckpt {arr.shape} vs model "
                f"{tuple(tmpl.shape)}")
        set_path(params, path, jax.numpy.asarray(arr))
        transferred += 1
    if strict and skipped:
        raise KeyError(f"unmatched checkpoint keys: {skipped[:10]}...")
    return params, transferred, skipped


def to_torch_state_dict(params, prefix: str = "bert_pretrained.",
                        include_tied_decoder: bool = True) -> Dict[str, Any]:
    """Export a torch-loadable state dict in the reference key layout."""
    out = {}
    for path, leaf in iter_param_items(params):
        arr = np.asarray(jax.device_get(leaf), dtype=np.float32)
        if path[-1] == "kernel":
            arr = arr.T
        out[prefix + torch_name(path)] = arr
    if include_tied_decoder:
        we = prefix + "bert.embeddings.word_embeddings.weight"
        out[prefix + "cls.predictions.decoder.weight"] = out[we]
    return out


def _resolve_archive(path: str):
    """HF-style local archive resolution (vilbert_dialog.py:1123-1232
    ``from_pretrained``): a ``.tar.gz`` containing ``pytorch_model.bin`` is
    extracted to a temp dir and the weights file path is returned. The
    URL/name-resolution half of the reference surface is unreachable
    without network egress and is intentionally not reproduced."""
    import tarfile
    import tempfile

    if not (os.path.isfile(path) and tarfile.is_tarfile(path)):
        return path, None
    tmp = tempfile.TemporaryDirectory(prefix="unimm_archive_")
    with tarfile.open(path, "r:*") as t:
        try:
            t.extractall(tmp.name, filter="data")
        except TypeError:      # older tarfile without the filter kwarg:
            # reject traversal members manually before extracting
            for m in t.getmembers():
                p = os.path.normpath(m.name)
                if p.startswith(("/", "..")) or os.path.isabs(p):
                    raise ValueError(
                        f"archive member escapes extraction dir: {m.name!r}")
            t.extractall(tmp.name)
    candidates = []
    for root, _, files in os.walk(tmp.name):
        for f in files:
            if f == "pytorch_model.bin":
                return os.path.join(root, f), tmp
            if f.endswith((".bin", ".ckpt", ".pt")):
                candidates.append(os.path.join(root, f))
    if len(candidates) == 1:
        return candidates[0], tmp
    if candidates:
        # refuse to guess between several non-canonical weight files —
        # os.walk order is filesystem-dependent and picking the wrong blob
        # (e.g. an optimizer .pt) would silently load garbage
        raise ValueError(
            f"archive {path!r} has no pytorch_model.bin and several "
            f"candidate weight files: {sorted(map(os.path.basename, candidates))}; "
            "repack with the weights as pytorch_model.bin")
    raise FileNotFoundError(
        f"archive {path!r} contains no pytorch_model.bin/.bin/.ckpt/.pt "
        "weights file")


def load_reference_ckpt(path: str, params_template):
    """Load a reference-format .ckpt (torch.save pickle) or a local
    HF-style .tar.gz archive.

    Returns (params, iter_id, n_transferred, skipped_keys)."""
    import torch  # lazy: only the converter touches torch

    path, _tmp = _resolve_archive(path)
    blob = torch.load(path, map_location="cpu", weights_only=False)
    iter_id = 0
    if isinstance(blob, dict) and "model_state_dict" in blob:
        iter_id = int(blob.get("iter_id", blob.get("iterId", 0)) or 0)
        blob = blob["model_state_dict"]
    state = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in blob.items()}
    params, n, skipped = from_torch_state_dict(params_template, state)
    return params, iter_id, n, skipped


def _graft_opt_state(node, mu_full, nu_full, upd_count, sched_count):
    """Rebuild an optax state pytree with restored Adam moments/counters.

    Replaces every ScaleByAdamState's (count, mu, nu), every
    ScaleByScheduleState count (the LR-schedule position), and MultiSteps'
    gradient_step; leaves masked-out group slots (MaskedNode) and everything
    else untouched. Covers the fused per-leaf AdamW too — its state IS a
    (ScaleByAdamState, ScaleByScheduleState) tuple (optim.
    make_fused_optimizer)."""
    import optax

    def rec(n):
        name = type(n).__name__
        if isinstance(n, optax.ScaleByAdamState):
            def graft(tmpl, full):
                if isinstance(tmpl, dict):
                    return {k: graft(v, full[k]) for k, v in tmpl.items()}
                if isinstance(tmpl, optax.MaskedNode):
                    return tmpl
                # keep the template leaf dtype (-adam_mu_dtype bfloat16
                # builds bf16 mu; restoring fp32 there would retrace the
                # whole train step for one step and double mu HBM)
                return jax.numpy.asarray(np.asarray(full), tmpl.dtype)
            return n._replace(
                count=jax.numpy.asarray(upd_count, n.count.dtype),
                mu=graft(n.mu, mu_full), nu=graft(n.nu, nu_full))
        if name == "ScaleByScheduleState":
            return n._replace(
                count=jax.numpy.asarray(sched_count, n.count.dtype))
        if name == "MultiStepsState":
            return n._replace(
                mini_step=jax.numpy.zeros_like(n.mini_step),
                gradient_step=jax.numpy.asarray(upd_count,
                                                n.gradient_step.dtype),
                inner_opt_state=rec(n.inner_opt_state))
        if hasattr(n, "_fields"):  # generic NamedTuple optax state
            return type(n)(*(rec(getattr(n, f)) for f in n._fields))
        if isinstance(n, tuple):
            return type(n)(rec(x) for x in n)
        if isinstance(n, list):
            return [rec(x) for x in n]
        if isinstance(n, dict):
            return {k: rec(v) for k, v in n.items()}
        return n

    return rec(node)


def load_reference_train_state(path: str, params_template, tx,
                               batch_multiply: int = 1):
    """Full ``-continue`` restore from a reference-format .ckpt: model weights
    + AdamW exp_avg/exp_avg_sq/step + LR-schedule position
    (/root/reference/train.py:371-386).

    The torch optimizer state is keyed by global param index; the reference
    builds one param group per parameter in ``named_parameters()`` order,
    which equals the saved ``model_state_dict`` key order minus the tied
    ``cls.predictions.decoder.weight`` duplicate (named_parameters removes
    shared tensors). The schedule ticks every micro-iteration in the
    reference (train.py:463) while our optax MultiSteps counts real updates,
    so the restored schedule count is ``iter_id // batch_multiply``.

    Returns (params, opt_state, iter_id, n_transferred).
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if "model_state_dict" not in blob:
        raise ValueError(f"{path} is not a full reference checkpoint "
                         "(no model_state_dict)")
    iter_id = int(blob.get("iter_id", blob.get("iterId", 0)) or 0)
    msd = blob["model_state_dict"]
    state = {k: v.numpy() if hasattr(v, "numpy") else v
             for k, v in msd.items()}
    params, n, _ = from_torch_state_dict(params_template, state)
    opt_state = tx.init(params)

    osd = blob.get("optimizer_state_dict")
    if not osd or not osd.get("state"):
        return params, opt_state, iter_id, n

    index_names = [k for k in msd.keys()
                   if _normalize_key(k) != "cls.predictions.decoder.weight"]
    nm = name_map(params_template)
    mu_full = jax.tree_util.tree_map(lambda x: np.zeros(x.shape, np.float32),
                                     jax.device_get(params))
    nu_full = jax.tree_util.tree_map(lambda x: np.zeros(x.shape, np.float32),
                                     jax.device_get(params))

    def set_path(tree, p, value):
        for k in p[:-1]:
            tree = tree[k]
        tree[p[-1]] = value

    step_val = 0
    for idx, pstate in osd["state"].items():
        name = _normalize_key(index_names[int(idx)])
        if name not in nm:
            continue
        p = nm[name]
        mu = np.asarray(pstate["exp_avg"], np.float32)
        nu = np.asarray(pstate["exp_avg_sq"], np.float32)
        if p[-1] == "kernel":
            mu, nu = mu.T, nu.T
        set_path(mu_full, p, mu)
        set_path(nu_full, p, nu)
        s = pstate.get("step", 0)
        step_val = max(step_val, int(np.asarray(s)))

    sched_count = iter_id // max(1, batch_multiply)
    opt_state = _graft_opt_state(opt_state, mu_full, nu_full,
                                 step_val, sched_count)
    return params, opt_state, iter_id, n


def extract_adam_moments(opt_state, params):
    """Merge the per-group ScaleByAdamState mu/nu back into full
    params-shaped host trees. Returns (mu, nu, count) — the inverse of the
    grafting in load_reference_train_state. Covers the fused per-leaf
    AdamW too (its state is a plain ScaleByAdamState tuple)."""
    import optax

    mu_full = jax.tree_util.tree_map(lambda x: np.zeros(x.shape, np.float32),
                                     jax.device_get(params))
    nu_full = jax.tree_util.tree_map(lambda x: np.zeros(x.shape, np.float32),
                                     jax.device_get(params))
    count = 0

    def fill(full, part):
        if isinstance(part, dict):
            for k, v in part.items():
                fill(full[k], v)
        elif not isinstance(part, optax.MaskedNode):
            full[...] = np.asarray(jax.device_get(part), np.float32)

    def rec(n):
        nonlocal count
        if isinstance(n, optax.ScaleByAdamState):
            count = max(count, int(np.asarray(jax.device_get(n.count))))
            fill(mu_full, n.mu)
            fill(nu_full, n.nu)
            return
        if hasattr(n, "_fields"):
            for f in n._fields:
                rec(getattr(n, f))
        elif isinstance(n, (tuple, list)):
            for x in n:
                rec(x)
        elif isinstance(n, dict):
            for x in n.values():
                rec(x)

    rec(opt_state)
    return mu_full, nu_full, count


def save_reference_ckpt(path: str, params, iter_id: int = 0, opt_state=None,
                        lang_set=None, lr: float = 2e-5,
                        image_lr: float = 2e-5):
    """Write a reference-format checkpoint dict (train.py:504-505 layout).

    With ``opt_state`` the torch AdamW ``optimizer_state_dict`` (one param
    group per parameter, reference train.py:329-346) and a
    ``scheduler_state_dict`` are included, so ``-continue`` in the REFERENCE
    codebase restores Adam moments and the schedule from our checkpoints."""
    import torch

    sd_np = to_torch_state_dict(params)
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in sd_np.items()}
    blob = {"model_state_dict": sd, "iter_id": iter_id}

    if opt_state is not None:
        mu, nu, count = extract_adam_moments(opt_state, params)
        mu_t = to_torch_state_dict(mu, prefix="bert_pretrained.",
                                   include_tied_decoder=False)
        nu_t = to_torch_state_dict(nu, prefix="bert_pretrained.",
                                   include_tied_decoder=False)
        index_names = [k for k in sd_np.keys()
                       if _normalize_key(k) != "cls.predictions.decoder.weight"]
        lang_set = lang_set or set()
        state, groups = {}, []
        for i, name in enumerate(index_names):
            state[i] = {"step": count,
                        "exp_avg": torch.from_numpy(mu_t[name]),
                        "exp_avg_sq": torch.from_numpy(nu_t[name])}
            key = _normalize_key(name)
            base = lr if key in lang_set else image_lr
            nodecay = ("bias" in key) or ("LayerNorm.weight" in key)
            groups.append({"params": [i], "lr": base,
                           "weight_decay": 0.0 if nodecay else 0.01,
                           "betas": (0.9, 0.999), "eps": 1e-6,
                           "correct_bias": True})
        blob["optimizer_state_dict"] = {"state": state,
                                        "param_groups": groups}
        blob["scheduler_state_dict"] = {
            "last_epoch": iter_id, "_step_count": iter_id + 1,
            "base_lrs": [g["lr"] for g in groups],
            "warmup_steps": 10000, "t_total": 200000,
        }
    torch.save(blob, path)


# ---------------------------------------------------------------------------
# native (Orbax) checkpointing
# ---------------------------------------------------------------------------

def save_native(directory: str, state, step: int):
    """Write the native Orbax full-state checkpoint.

    Multi-process: EVERY process must call this (orbax's save protocol runs
    internal cross-process barriers; a rank-0-only call deadlocks against
    them). Orbax writes from the primary process; pass the gathered host
    state (parallel.mesh.gather_to_host) on all ranks."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_native(path: str, state_template):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), state_template)


def latest_native(directory: str):
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    if not steps:
        return None
    step = max(steps)
    return os.path.join(directory, f"step_{step}"), step


def latest_reference_ckpt(directory: str):
    """(path, iter_id) of the highest-numbered
    ``visdial_dialog_encoder_<iter>.ckpt`` under ``directory``, or None —
    the reference-format analogue of ``latest_native`` (the dense phase
    writes only .ckpt files, dense_annotation_finetuning.py:324-326)."""
    if not os.path.isdir(directory):
        return None
    best = None
    prefix, suffix = "visdial_dialog_encoder_", ".ckpt"
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(suffix):
            try:
                it = int(name[len(prefix):-len(suffix)])
            except ValueError:
                continue
            if best is None or it > best[1]:
                best = (os.path.join(directory, name), it)
    return best


# ---------------------------------------------------------------------------
# optimizer param grouping (train.py:322-347)
# ---------------------------------------------------------------------------

def language_param_set(language_weights: List[str]) -> set:
    return {_normalize_key(k) for k in language_weights}


def group_label(path: Tuple[str, ...], lang_set: set) -> str:
    """Return one of 'lang_decay', 'lang_nodecay', 'img_decay', 'img_nodecay'.

    Replicates the reference grouping exactly: membership in
    language_weights.json decides lr; a substring match on
    bias/LayerNorm decides weight decay (train.py:323,337).
    """
    name = torch_name(path)
    lang = name in lang_set
    no_decay = ("bias" in name) or ("LayerNorm.weight" in name)
    return ("lang" if lang else "img") + ("_nodecay" if no_decay else "_decay")
