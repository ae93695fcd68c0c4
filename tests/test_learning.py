"""Learning sanity: the full jitted train step must actually fit data.

Runs repeated steps on one fixed batch with a tiny model and checks that the
combined loss and its parts drop substantially — the grad/optimizer
equivalent of the reference's `-overfit` eyeball test (SURVEY §4)."""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_model import TINY, make_batch
from unimm_tpu.models import vilbert
from unimm_tpu.train import optim, step as tstep


def test_train_step_overfits_single_batch():
    cfg = TINY
    params = vilbert.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, L, R = 6, cfg.max_seq_len, cfg.max_regions
    batch = make_batch(rng, cfg, B=B)
    labels = np.full((B, L), -1, np.int32)
    labels[:, 15:20] = rng.integers(0, cfg.vocab_size, size=(B, 5))
    w = np.zeros((B, L), np.float32)
    w[:, 15:20] = 1.0
    w[4:, 15:20] = -1.0           # unlikelihood rows
    batch.update({
        "mlm_labels": jnp.asarray(labels),
        "lm_weight": jnp.asarray(w),
        "next_sentence_label": jnp.asarray(rng.integers(0, 2, B)),
        "image_target": jnp.asarray(
            rng.dirichlet(np.ones(cfg.v_target_size), (B, R))
            .astype(np.float32)),
        "image_label": jnp.asarray(rng.choice([-1, 1], (B, R))),
    })

    ocfg = optim.OptimConfig(lr=2e-3, image_lr=2e-3, warmup_steps=1,
                             t_total=1000, min_lr=1e-5, batch_multiply=1)
    tx = optim.make_optimizer(params, ocfg)
    state = tstep.init_state(params, tx, seed=0)
    train_step = tstep.make_train_step(cfg, tx, dtype=jnp.float32)

    first = None
    for i in range(60):
        state, metrics = train_step(state, batch, jnp.asarray([1.0, 1.0]))
        if first is None:
            first = {k: float(v) for k, v in metrics.items()}
    last = {k: float(v) for k, v in metrics.items()}

    assert np.isfinite(last["loss"])
    assert last["loss"] < 0.5 * first["loss"], (first, last)
    assert last["nsp_loss"] < first["nsp_loss"]
    assert last["lm_loss"] < first["lm_loss"]
    assert int(np.asarray(state["step"])) == 60
