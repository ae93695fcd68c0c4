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


def load_reference_ckpt(path: str, params_template):
    """Load a reference-format .ckpt (torch.save pickle). Returns
    (params, iter_id)."""
    import torch  # lazy: only the converter touches torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    iter_id = 0
    if isinstance(blob, dict) and "model_state_dict" in blob:
        iter_id = int(blob.get("iter_id", blob.get("iterId", 0)) or 0)
        blob = blob["model_state_dict"]
    state = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in blob.items()}
    params, n, skipped = from_torch_state_dict(params_template, state)
    return params, iter_id, n, skipped


def save_reference_ckpt(path: str, params, iter_id: int = 0):
    """Write a reference-format checkpoint dict (model weights + iter_id)."""
    import torch

    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in to_torch_state_dict(params).items()}
    torch.save({"model_state_dict": sd, "iter_id": iter_id}, path)


# ---------------------------------------------------------------------------
# native (Orbax) checkpointing
# ---------------------------------------------------------------------------

def save_native(directory: str, state, step: int):
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
