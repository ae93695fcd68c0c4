"""Stub-data dry-run of scripts/quality_gate.py — proves the gate script is
known-good before real VisDial data / the released checkpoint ever arrive
(the real invocation gates against the reference's committed golden log,
/root/reference/results/generative_results_v1.0_val/val_lm.log, which this
test also parses for real)."""

import importlib.util
import json
import os

import numpy as np
import pytest

from tests import fixtures
from tests.test_cli import TINY_MODEL_JSON

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE = os.path.join(REPO, "scripts", "quality_gate.py")

spec = importlib.util.spec_from_file_location("quality_gate", GATE)
quality_gate = importlib.util.module_from_spec(spec)
spec.loader.exec_module(quality_gate)


def test_parse_reference_golden_log():
    """The default golden log parses and carries every gated metric with
    the published values (val_lm.log's final block)."""
    g = quality_gate.parse_golden(quality_gate.GOLDEN_DEFAULT)
    assert abs(g["ndcg"] - 0.6922680735588074) < 1e-9
    assert abs(g["mrr"] - 0.5131067633628845) < 1e-9  # final block, not
    # the running-metrics block earlier in the log (last occurrence wins)
    for k in quality_gate.GATED:
        assert k in g, k
    # last-occurrence-wins: the running blocks earlier in the log must not
    # shadow the final full-split numbers
    assert 0 < g["mean"] < 100


@pytest.fixture(scope="module")
def gate_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("qgate")
    paths, tok, reader = fixtures.write_fixture_tree(str(root))
    model_cfg = root / "tiny_model.json"
    model_cfg.write_text(json.dumps(TINY_MODEL_JSON))
    from unimm_tpu.cli import common
    orig = common.open_reader
    common.open_reader = lambda p: reader
    yield {"root": str(root), "paths": paths, "model_cfg": str(model_cfg)}
    common.open_reader = orig


def _gate_argv(world, golden, extra=()):
    p = world["paths"]
    return [
        "--golden", golden,
        "-visdial_processed_train", p["visdial_processed_train"],
        "-visdial_processed_val", p["visdial_processed_val"],
        "-visdial_processed_test", p["visdial_processed_test"],
        "-visdial_processed_train_dense", p["visdial_processed_train_dense"],
        "-visdial_processed_train_dense_annotations",
        p["visdial_processed_train_dense_annotations"],
        "-visdial_processed_val_dense_annotations",
        p["visdial_processed_val_dense_annotations"],
        "-visdial_image_feats", os.path.join(world["root"], "feats.dict"),
        "-vocab_path", p["vocab_path"],
        "-model_config", world["model_cfg"],
        "-val_dis", "0",
        "-max_seq_len", "96", "-num_options", "20",
        "-num_workers", "2", "-eval_chunk", "64", "-dtype", "float32",
        "-save_name", os.path.join(world["root"], "qg"),
        "-language_weights", "/nonexistent",
    ] + list(extra)


def test_quality_gate_stub_roundtrip(gate_world):
    """End-to-end dry run: a checkpoint saved in the reference .ckpt format
    is converted + evaluated by the gate; gating against a golden log
    written from the same run PASSES, against a perturbed one FAILS."""
    import jax

    from unimm_tpu import checkpoint as C
    from unimm_tpu.cli import common, options, val_lm
    from unimm_tpu.models import vilbert

    # a reference-format .ckpt (exercises load_reference_ckpt conversion)
    params = options.read_command_line(_gate_argv(gate_world, "x")[2:])
    cfg = common.build_config(params)
    model_params = vilbert.init_params(jax.random.PRNGKey(7), cfg)
    ckpt = os.path.join(gate_world["root"], "released_stub.ckpt")
    C.save_reference_ckpt(ckpt, model_params, iter_id=123)

    # first run through val_lm directly -> synthesize the "golden" log the
    # way the reference writes its val logs (name: value lines)
    metrics = val_lm.main(_gate_argv(gate_world, "x",
                                     ["-start_path", ckpt])[2:])
    golden = os.path.join(gate_world["root"], "golden_stub.log")
    with open(golden, "w") as f:
        # a running-metrics block first: parse_golden must take the LAST
        f.write("ndcg: 0.0\nmrr: 0.0\n")
        for k, v in metrics.items():
            f.write(f"{k}: {v}\n")

    rc = quality_gate.main(_gate_argv(gate_world, golden,
                                      ["-start_path", ckpt]))
    assert rc == 0

    perturbed = os.path.join(gate_world["root"], "golden_bad.log")
    with open(golden) as f, open(perturbed, "w") as g:
        for line in f:
            if line.startswith("ndcg:"):
                line = f"ndcg: {float(line.split(':')[1]) + 0.05}\n"
            g.write(line)
    rc = quality_gate.main(_gate_argv(gate_world, perturbed,
                                      ["-start_path", ckpt]))
    assert rc == 1
