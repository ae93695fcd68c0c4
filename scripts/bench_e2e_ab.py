"""End-to-end A/B of attention_impl through the production evaluator.

Same workload and protocol as bench.py, parameterised by attention_impl so
kernel changes are measured on the metric that counts (val_lm dialogs/s/chip).

Usage: python scripts/bench_e2e_ab.py [xla pallas pallas_block ...]
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


def run(spec, chunk=250):
    impl, _, opt = spec.partition(":")
    if opt.isdigit():
        chunk, opt = int(opt), ""
    from unimm_tpu.config import VilbertConfig
    from unimm_tpu.data.dataset import flatten_for_forward
    from unimm_tpu.eval.evaluator import RankingEvaluator
    from unimm_tpu.models import vilbert

    cfg = dataclasses.replace(VilbertConfig(), attention_impl=impl,
                              fused_ffn=opt != "noffn",
                              fused_co=opt != "noco")
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, R, O, L, Rg = 2, 10, 100, cfg.max_seq_len, cfg.max_regions

    def make_val_batch():
        # labels in the masked second answer copy [ctx_end, ctx_end+ans),
        # matching bench.py / real val_lm layout (encode_gen)
        ctx_end = rng.integers(60, 200, (B, R, O)).astype(np.int32)
        ans_len = rng.integers(2, 9, (B, R, O)).astype(np.int32)
        labels = np.full((B, R, O, L), -1, np.int32)
        pos = np.arange(L)[None, None, None, :]
        span = (pos >= ctx_end[..., None]) & \
               (pos < (ctx_end + ans_len)[..., None])
        labels[span] = rng.integers(0, cfg.vocab_size, int(span.sum()))
        return {
            "tokens": rng.integers(1, cfg.vocab_size,
                                   (B, R, O, L)).astype(np.int32),
            "segments": rng.integers(0, 2, (B, R, O, L)).astype(np.int32),
            "mode": np.ones((B, R, O), np.int32),
            "ctx_end": ctx_end,
            "ans_len": ans_len,
            "mlm_labels": labels,
            "image_feat": rng.normal(size=(B, Rg, 2048)).astype(np.float32),
            "image_loc": rng.normal(size=(B, Rg, 5)).astype(np.float32),
            "image_mask": np.ones((B, Rg), np.float32),
        }

    ev = RankingEvaluator(cfg, chunk_size=chunk, dtype=jnp.bfloat16,
                          need_lm=True, need_nsp=False)
    flats = [flatten_for_forward(make_val_batch(), train=False,
                                 compact_images=True) for _ in range(3)]
    for f in flats:
        ev.score_flat(params, f)
    iters, repeats = 6, []
    for _ in range(5):
        t0 = time.perf_counter()
        for i in range(iters):
            ev.score_flat(params, flats[i % 3])
        dt = time.perf_counter() - t0
        repeats.append(B * R * O * iters / dt)
    med = sorted(repeats)[len(repeats) // 2]
    print(f"{spec:20s} {med/1000.0:7.4f} dialogs/s/chip  "
          f"({med:.1f} seq/s; runs {[round(r,1) for r in repeats]})")


if __name__ == "__main__":
    for impl in (sys.argv[1:] or ["xla", "pallas_block"]):
        run(impl)
