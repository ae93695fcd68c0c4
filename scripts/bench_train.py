"""Training-step benchmark + attribution on the real TPU.

Measures the full jitted train step (fwd+bwd+optimizer, remat, gathered MLM)
at the paper's 240-sequence batch, and ablations that attribute the cost:
dropout off (RNG share), xla vs pallas attention path.

Usage: python scripts/bench_train.py [variant ...]
Variants: base nodrop pallas_nodrop
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from unimm_tpu.config import VilbertConfig
from unimm_tpu.models import vilbert
from unimm_tpu.train import optim, step as tstep

B = 240


def make_batch(seed, cfg, nb=None):
    rng = np.random.default_rng(seed)
    nb = nb or B
    L, R = cfg.max_seq_len, cfg.max_regions
    ctx_end = rng.integers(60, 200, nb).astype(np.int32)
    ans_len = rng.integers(2, 9, nb).astype(np.int32)
    labels = np.full((nb, L), -1, np.int32)
    n_lab = rng.integers(10, 40, nb)
    for i in range(nb):
        # label positions inside the sequence's real extent (answer span +
        # corrupted context), like the data pipeline produces — earlier
        # revisions scattered them over the whole padded length
        hi = max(int(ctx_end[i]) - 2, 12)
        k = min(int(n_lab[i]), hi)
        pos = rng.permutation(hi)[:k] + 1
        labels[i, pos] = rng.integers(0, cfg.vocab_size, k)
    w = np.zeros((nb, L), np.float32)
    w[labels != -1] = 1.0
    w[: nb // 4][labels[: nb // 4] != -1] = -1.0   # UL portion
    return {k: jnp.asarray(v) for k, v in {
        "tokens": rng.integers(1, cfg.vocab_size, (nb, L)).astype(np.int32),
        "segments": rng.integers(0, 2, (nb, L)).astype(np.int32),
        "mode": rng.integers(0, 2, nb).astype(np.int32),
        "ctx_end": ctx_end,
        "ans_len": ans_len,
        "mlm_labels": labels, "lm_weight": w,
        "next_sentence_label": rng.integers(0, 2, nb).astype(np.int32),
        "image_feat": rng.normal(size=(nb, R, 2048)).astype(np.float32),
        "image_loc": rng.normal(size=(nb, R, 5)).astype(np.float32),
        "image_mask": np.ones((nb, R), np.int32),
        "image_target": rng.dirichlet(np.ones(cfg.v_target_size),
                                      (nb, R)).astype(np.float32),
        "image_label": rng.choice([-1, 0, 1], (nb, R)).astype(np.int32),
    }.items()}


def variant_cfg(name):
    cfg = dataclasses.replace(VilbertConfig(), remat=True)
    if name == "nodrop":
        cfg = dataclasses.replace(
            cfg, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0)
    elif name == "pallas_nodrop":
        cfg = dataclasses.replace(
            cfg, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
            attention_impl="pallas")
    elif name == "pallas_block":
        cfg = dataclasses.replace(cfg, attention_impl="pallas_block")
    elif name == "pallas_block_noremat":
        cfg = dataclasses.replace(cfg, attention_impl="pallas_block",
                                  remat=False)
    elif name == "noremat":
        cfg = dataclasses.replace(cfg, remat=False)
    elif name == "pallas_block_nodrop":
        cfg = dataclasses.replace(
            cfg, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            v_hidden_dropout_prob=0.0, v_attention_probs_dropout_prob=0.0,
            attention_impl="pallas_block")
    return cfg


def bench(name):
    # optimizer ablations compose with any model variant:
    #   <variant>+sgd     — plain SGD bounds the whole AdamW update cost
    #   <variant>+mubf16  — bf16 first moment (halved mu HBM traffic)
    # spec grammar: <variant>[@<micro>x<k>][+<opt>]
    #   +sgd / +mubf16 / +adamw1 / +flat1 / +fused — optimizer ablations
    #   @<micro>x<k> — k accumulation micro-steps of size micro
    #     (optax.MultiSteps) per effective batch, e.g. 'noremat@120x2'
    #     trades remat's ~33% recompute for accumulator traffic
    label = name
    opt_kind = "adamw"
    for suffix in ("+sgd", "+mubf16", "+adamw1", "+flat1", "+fused"):
        if name.endswith(suffix):
            name, opt_kind = name[: -len(suffix)], suffix[1:]
            break
    # '+noxattn' (composes after the optimizer suffix strip): monkeypatch
    # vilbert.attention_core to a pass-through. Under attention_impl=
    # pallas_block TRAINING the text stream runs the fused kernels, so
    # attention_core's only remaining callers are the vision self-attention
    # and both co-attention directions (vilbert.py:358-369) — the delta
    # vs the unablated variant UPPER-BOUNDS what fusing those sub-blocks
    # could ever save (a fused kernel still pays the QKV/PV matmuls; this
    # ablation removes even those score/softmax/PV FLOPs).
    ablate_core = name.endswith("+noxattn")
    if ablate_core:
        name = name[: -len("+noxattn")]
    if "+" in name:
        raise SystemExit(f"unknown optimizer suffix in {label!r}")
    micro, ksteps, sort_buckets = B, 1, False
    if "@" in name:
        name, spec = name.split("@", 1)
        morsel_div = 4
        if spec.endswith("s8"):     # 's8': sorted morsels, eighth buckets
            sort_buckets, morsel_div, spec = True, 8, spec[:-2]
        elif spec.endswith("s"):    # 's': sorted morsels, quarter buckets
            sort_buckets, spec = True, spec[:-1]
        m_s, k_s = spec.split("x")
        micro, ksteps = int(m_s), int(k_s)
    cfg = variant_cfg(name)
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    ocfg = optim.OptimConfig(batch_multiply=ksteps, warmup_steps=10,
                             t_total=1000,
                             mu_dtype="bfloat16" if opt_kind == "mubf16"
                             else None)
    import optax
    if opt_kind == "sgd":
        tx = optax.sgd(1e-5)
        if ksteps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=ksteps)
    elif opt_kind == "adamw1":     # single-group adamw (no groups)
        tx = optax.adamw(optim.warmup_linear_nonzero(2e-5, ocfg),
                         b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.01)
    elif opt_kind == "flat1":      # single-group, flattened to one vector
        tx = optax.flatten(optax.adamw(
            optim.warmup_linear_nonzero(2e-5, ocfg),
            b1=0.9, b2=0.999, eps=1e-6, weight_decay=0.01))
    elif opt_kind == "fused":      # flat-moment fused Pallas update kernel
        tx = optim.make_fused_optimizer(params, ocfg)
    else:
        tx = optim.make_optimizer(params, ocfg)
    name = label
    state = tstep.init_state(params, tx, seed=0)
    # the patch must span the warmup calls below (jit traces on first call);
    # restored at the end of bench() so variants compose in one process
    core0 = vilbert.attention_core
    if ablate_core:
        # query-shaped stub (co-attention has q_len != kv_len): drops the
        # score/softmax/PV chain and lets XLA DCE the q/k projections too —
        # strictly MORE than any fused kernel could save
        vilbert.attention_core = lambda q, k, v, bias, **kw: jnp.broadcast_to(
            jnp.mean(v, axis=2, keepdims=True),
            q.shape[:3] + (v.shape[-1],))
    train_step = tstep.make_train_step(cfg, tx, dtype=jnp.bfloat16)
    nsp_weight = jnp.asarray([1.0, 1.0])
    def make_group(s):
        if not sort_buckets:
            return [make_batch(s * ksteps + j, cfg, micro)
                    for j in range(ksteps)]
        # the production regrouping (sort by extent, quarter-length
        # buckets, group-level lm_norm) — data/dataset.py
        from unimm_tpu.data.dataset import length_bucket_morsels
        flats = [{k: np.asarray(v) for k, v in
                  make_batch(s * ksteps + j, cfg, micro).items()}
                 for j in range(ksteps)]
        return [{k: jnp.asarray(v) for k, v in m.items()}
                for m in length_bucket_morsels(flats, cfg.max_seq_len,
                                               ksteps, div=morsel_div)]

    batches = [make_group(s) for s in range(3)]
    for group in batches:  # compile + warm
        for b in group:
            state, m = train_step(state, b, nsp_weight)
    float(np.asarray(m["loss"]))
    times = []
    for rep in range(6):
        group = batches[rep % 3]
        t0 = time.perf_counter()
        for b in group:
            state, m = train_step(state, b, nsp_weight)
        float(np.asarray(m["loss"]))   # host fetch closes the timing
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    eff = micro * ksteps
    print(f"{name:16s} {med*1e3:8.1f} ms/step  ({eff/med:.1f} seq/s)  "
          f"min {min(times)*1e3:.1f} max {max(times)*1e3:.1f}")
    vilbert.attention_core = core0


if __name__ == "__main__":
    for n in (sys.argv[1:] or ["base", "nodrop"]):
        bench(n)
