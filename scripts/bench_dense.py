"""Dense-annotation finetuning step benchmark on the real TPU.

Measures the jitted dense step (cli/dense_finetune.make_dense_step: encode +
gathered LM + nsp + neuralNDCG_transposed rank loss + grouped AdamW over a
100-option slate — the TPU equivalent of
/root/reference/dense_annotation_finetuning.py:146-301) at the flagship
config. This was the one unmeasured jitted phase (round-3 VERDICT #3).

Variants (args, default "full short"):
  full   — slate at the full 256-seq length (long-dialog rounds)
  short  — slate whose shared context sits in a 128 bucket (early rounds;
           the CLI's length_buckets slicing makes this the common case)

Protocol: async dispatches over distinct staged slates closed by one host
fetch (CLAUDE.md relay rules), median of 6 repeats of 4 steps.
"""

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
from unimm_tpu.cli.dense_finetune import make_dense_step
from unimm_tpu.models import vilbert
from unimm_tpu.train import optim

O = 100


def make_slate(seed, cfg, Lb, ctx_range):
    """One GT-first 100-option dense slate, shared round context (the real
    VisdialDatasetDense shape), pre-sliced to the Lb bucket like the CLI."""
    rng = np.random.default_rng(seed)
    R = cfg.max_regions
    lc = int(rng.integers(*ctx_range))
    ctx = rng.integers(1, cfg.vocab_size, lc).astype(np.int32)
    cs = rng.integers(0, 2, lc).astype(np.int32)
    toks = np.zeros((O, Lb), np.int32)
    segs = np.zeros((O, Lb), np.int32)
    labs = np.full((O, Lb), -1, np.int32)
    w = np.zeros((O, Lb), np.float32)
    ce = np.zeros(O, np.int32)
    al = np.zeros(O, np.int32)
    for o in range(O):
        a = int(rng.integers(2, 9))
        ans = rng.integers(1, cfg.vocab_size, a).astype(np.int32)
        toks[o, :lc], segs[o, :lc] = ctx, cs
        t1, t2 = lc + a, min(lc + 2 * a, Lb)
        toks[o, lc:t1] = ans
        toks[o, t1:t2] = ans[: t2 - t1]
        labs[o, t1:t2] = ans[: t2 - t1]
        w[o, t1:t2] = 1.0
        ce[o], al[o] = t1, a
    return {
        "tokens": toks, "segments": segs,
        "mode": np.ones(O, np.int32), "ctx_end": ce, "ans_len": al,
        "mlm_labels": labs, "lm_weight": w,
        "next_sentence_label": np.concatenate(
            [[0], np.ones(O - 1)]).astype(np.int32),
        "image_feat": rng.normal(size=(O, R, cfg.v_feature_size)).astype(
            np.float32),
        "image_loc": rng.normal(size=(O, R, 5)).astype(np.float32),
        "image_mask": np.ones((O, R), np.float32),
        "image_target": rng.dirichlet(
            np.ones(cfg.v_target_size), (O, R)).astype(np.float32),
        "image_label": rng.choice([-1, 0, 1], (O, R)).astype(np.int32),
    }


def bench(name):
    Lb, ctx_range = (256, (150, 200)) if name == "full" else (128, (60, 100))
    cfg = VilbertConfig()  # production: pallas_block + remat defaults
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(params, optim.OptimConfig(batch_multiply=1))
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.zeros((), jnp.int32), "rng": jax.random.PRNGKey(0)}
    step = make_dense_step(cfg, tx, dtype=jnp.bfloat16)

    n = 4
    slates = [({k: jnp.asarray(v) for k, v in
                make_slate(s, cfg, Lb, ctx_range).items()},
               jnp.asarray(np.random.default_rng(90 + s).random(O),
                           jnp.float32))
              for s in range(n)]
    for b, gr in slates:   # compile + warm (distinct inputs, CLAUDE.md)
        state, parts = step(state, b, gr)
    float(np.asarray(parts["loss"]))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        for b, gr in slates:
            state, parts = step(state, b, gr)
        float(np.asarray(parts["loss"]))   # host fetch closes the timing
        ts.append((time.perf_counter() - t0) / n * 1000)
    med = sorted(ts)[len(ts) // 2]
    print(f"dense {name:5s} (Lb={Lb}) {med:7.1f} ms/step  "
          f"(runs: " + " ".join(f"{t:.1f}" for t in ts) + ")", flush=True)


if __name__ == "__main__":
    for nme in (sys.argv[1:] or ["full", "short"]):
        bench(nme)
