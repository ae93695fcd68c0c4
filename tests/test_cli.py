"""End-to-end CLI smoke tests on the synthetic fixture tree with a tiny model
config — every entry point runs its full flow in-process."""

import json
import os

import numpy as np
import pytest

from tests import fixtures

TINY_MODEL_JSON = {
    "attention_probs_dropout_prob": 0.1, "hidden_act": "gelu",
    "hidden_dropout_prob": 0.1, "hidden_size": 32, "initializer_range": 0.02,
    "intermediate_size": 64, "max_position_embeddings": 128,
    "num_attention_heads": 2, "num_hidden_layers": 2, "type_vocab_size": 2,
    "vocab_size": 205, "v_feature_size": 64, "v_target_size": 32,
    "v_hidden_size": 24, "v_num_hidden_layers": 2, "v_num_attention_heads": 2,
    "v_intermediate_size": 48, "bi_hidden_size": 16,
    "bi_num_attention_heads": 2, "v_biattention_id": [1],
    "t_biattention_id": [1], "fusion_method": "mul",
}


@pytest.fixture(scope="module")
def cli_world(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    paths, tok, reader = fixtures.write_fixture_tree(str(root))
    model_cfg = root / "tiny_model.json"
    model_cfg.write_text(json.dumps(TINY_MODEL_JSON))

    # make the feature reader reachable through a path: monkeypatch
    # open_features to return the in-memory reader for this path token
    from unimm_tpu.cli import common
    sentinel = str(root / "feats.dict")
    orig = common.open_reader
    common.open_reader = lambda p: reader
    yield {
        "root": str(root), "paths": paths, "model_cfg": str(model_cfg),
        "sentinel": sentinel,
    }
    common.open_reader = orig


def _argv(world, extra):
    p = world["paths"]
    argv = [
        "-visdial_processed_train", p["visdial_processed_train"],
        "-visdial_processed_val", p["visdial_processed_val"],
        "-visdial_processed_test", p["visdial_processed_test"],
        "-visdial_processed_train_dense", p["visdial_processed_train_dense"],
        "-visdial_processed_train_dense_annotations",
        p["visdial_processed_train_dense_annotations"],
        "-visdial_processed_val_dense_annotations",
        p["visdial_processed_val_dense_annotations"],
        "-visdial_image_feats", world["sentinel"],
        "-vocab_path", p["vocab_path"],
        "-model_config", world["model_cfg"],
        "-max_seq_len", "96", "-num_options", "20",
        "-num_workers", "2", "-eval_chunk", "64", "-dtype", "float32",
        "-save_path", os.path.join(world["root"], "ckpt"),
        "-language_weights", "/nonexistent",
    ]
    return argv + extra


def test_val_lm_cli(cli_world):
    from unimm_tpu.cli import val_lm
    os.chdir(cli_world["root"])
    metrics = val_lm.main(_argv(cli_world, ["-val_dis", "0",
                                            "-save_name", "t_val_lm"]))
    assert 0 <= metrics["ndcg"] <= 1
    assert metrics["mean"] > 1
    pred = os.path.join(cli_world["root"], "t_val_lm_predictions.txt")
    assert os.path.exists("t_val_lm_predictions.txt")
    ranks = json.load(open("t_val_lm_predictions.txt"))
    assert len(ranks) == 3 * 10 and len(ranks[0]["ranks"]) == 20
    # -gen_prefix 0 disables the prefix-cache scorer; the two paths agree
    # to float rounding, so assert the robust property (identical ranks)
    # plus metric closeness rather than bitwise metric equality
    m2 = val_lm.main(_argv(cli_world, ["-val_dis", "0", "-gen_prefix", "0",
                                       "-save_name", "t_val_lm_flat"]))
    flat_ranks = json.load(open("t_val_lm_flat_predictions.txt"))
    assert [r["ranks"] for r in flat_ranks] == [r["ranks"] for r in ranks]
    for k in ("ndcg", "mrr", "mean"):
        assert abs(m2[k] - metrics[k]) < 1e-3, (k, m2[k], metrics[k])


def test_val_avg_lm_cli(cli_world):
    from unimm_tpu.cli import val_avg_lm
    os.chdir(cli_world["root"])
    metrics = val_avg_lm.main(_argv(cli_world, ["-val_dis", "0",
                                                "-save_name", "t_avg"]))
    assert 0 <= metrics["ndcg"] <= 1


def test_train_cli_overfit(cli_world):
    from unimm_tpu.cli import train
    os.chdir(cli_world["root"])
    state = train.main(_argv(cli_world, [
        "-overfit", "-num_epochs", "1", "-batch_size", "12",
        "-sequences_per_image", "6", "-num_negative_samples", "1",
        "-eval_every_epochs", "1", "-save_name", "t_train"]))
    assert int(np.asarray(state["step"])) > 0
    ckpt_dir = os.path.join(cli_world["root"], "ckpt", "t_train")
    files = os.listdir(ckpt_dir)
    assert any(f.endswith(".ckpt") for f in files)
    assert "native" in files


def test_train_cli_fused_adamw(cli_world):
    """-fused_adamw 1: the flat-moment fused update kernel drives the real
    CLI loop, writes a reference-format .ckpt with moments (fused_layout
    export path), and -continue restores them (fused graft path)."""
    from unimm_tpu.cli import train
    os.chdir(cli_world["root"])
    state = train.main(_argv(cli_world, [
        "-overfit", "-num_epochs", "1", "-batch_size", "12",
        "-sequences_per_image", "6", "-num_negative_samples", "1",
        "-eval_every_epochs", "1", "-fused_adamw", "1",
        "-save_name", "t_fused"]))
    assert int(np.asarray(state["step"])) > 0
    ckpt_dir = os.path.join(cli_world["root"], "ckpt", "t_fused")
    ckpts = [f for f in os.listdir(ckpt_dir) if f.endswith(".ckpt")]
    assert ckpts
    state2 = train.main(_argv(cli_world, [
        "-overfit", "-num_epochs", "1", "-batch_size", "12",
        "-sequences_per_image", "6", "-num_negative_samples", "1",
        "-eval_every_epochs", "1", "-fused_adamw", "1",
        "-continue", "-start_path", os.path.join(ckpt_dir, ckpts[0]),
        "-save_name", "t_fused2"]))
    import optax
    opt = state2["opt_state"]
    inner = opt.inner_opt_state if hasattr(opt, "inner_opt_state") else opt
    assert isinstance(inner[0], optax.ScaleByAdamState)
    assert int(np.asarray(state2["step"])) > int(np.asarray(state["step"]))


def test_train_then_val_from_checkpoint(cli_world):
    from unimm_tpu.cli import val
    os.chdir(cli_world["root"])
    ckpt_dir = os.path.join(cli_world["root"], "ckpt", "t_train")
    ckpt = [f for f in os.listdir(ckpt_dir) if f.endswith(".ckpt")][0]
    metrics = val.main(_argv(cli_world, [
        "-model_paths", os.path.join(ckpt_dir, ckpt),
        "-save_name", "t_val_ens"]))
    assert "ndcg" in metrics


def test_evaluate_cli(cli_world):
    from unimm_tpu.cli import evaluate
    os.chdir(cli_world["root"])
    ckpt_dir = os.path.join(cli_world["root"], "ckpt", "t_train")
    ckpt = [f for f in os.listdir(ckpt_dir) if f.endswith(".ckpt")][0]
    evaluate.main(_argv(cli_world, [
        "-model_paths", os.path.join(ckpt_dir, ckpt),
        "-save_name", "t_eval"]))
    ranks = json.load(open("t_eval_predictions.txt"))
    assert len(ranks) == 2           # 2 test dialogs
    assert len(ranks[0]["ranks"]) == 100
    assert ranks[0]["round_id"] == 10


def test_dense_finetune_cli(cli_world):
    from unimm_tpu.cli import dense_finetune
    os.chdir(cli_world["root"])
    state = dense_finetune.main(_argv(cli_world, [
        "-overfit", "-num_epochs", "1", "-batch_multiply", "2",
        "-save_name", "t_dense"]))
    assert int(np.asarray(state["step"])) > 0


def test_train_continue_resumes(cli_world):
    """-continue -start_path <dir> restores the native (orbax) state and the
    step counter advances from where it stopped."""
    from unimm_tpu.cli import train
    os.chdir(cli_world["root"])
    args = _argv(cli_world, [
        "-overfit", "-num_epochs", "1", "-batch_size", "12",
        "-sequences_per_image", "6", "-num_negative_samples", "1",
        "-eval_every_epochs", "99", "-save_name", "t_resume"])
    state1 = train.main(args)
    step1 = int(np.asarray(state1["step"]))
    assert step1 > 0
    native_dir = os.path.join(cli_world["root"], "ckpt", "t_resume", "native")
    state2 = train.main(args + ["-continue", "-start_path", native_dir])
    step2 = int(np.asarray(state2["step"]))
    assert step2 == 2 * step1, (step1, step2)


def test_train_cli_tensor_parallel(cli_world):
    """mp=2 tensor-parallel training through the CLI on the 8-device mesh
    (4x2): params sharded by the Megatron rules, one epoch completes."""
    from unimm_tpu.cli import train
    os.chdir(cli_world["root"])
    state = train.main(_argv(cli_world, [
        "-overfit", "-num_epochs", "1", "-batch_size", "16",
        "-sequences_per_image", "8", "-num_negative_samples", "1",
        "-eval_every_epochs", "1", "-mesh_mp", "2",
        "-save_name", "t_train_mp"]))
    assert int(np.asarray(state["step"])) > 0
    # a column-sharded kernel really is split over the mp axis
    k = state["params"]["bert"]["encoder"]["layer"]["0"]["intermediate"][
        "dense"]["kernel"]
    shard_shapes = {tuple(s.data.shape) for s in k.addressable_shards}
    full = tuple(k.shape)
    assert any(ss[1] == full[1] // 2 for ss in shard_shapes), shard_shapes


def test_n_gpus_limits_mesh_device_count(cli_world):
    """-n_gpus N uses exactly N mesh devices (reference options.py:58
    semantics); 0 means all local devices (round-1 VERDICT item 6)."""
    import jax
    from unimm_tpu.cli import common, train
    assert common.mesh_device_count({"n_gpus": 0}) == len(jax.devices())
    assert common.mesh_device_count({"n_gpus": 2}) == 2
    assert common.eval_mesh({"n_gpus": 1}) is None
    m = common.eval_mesh({"n_gpus": 4, "mesh_mp": 1})
    assert m.size == 4
    with pytest.raises(AssertionError):
        common.mesh_device_count({"n_gpus": len(jax.devices()) + 1})

    os.chdir(cli_world["root"])
    state = train.main(_argv(cli_world, [
        "-overfit", "-num_epochs", "1", "-batch_size", "8",
        "-sequences_per_image", "8", "-num_negative_samples", "1",
        "-eval_every_epochs", "5", "-n_gpus", "2",
        "-save_name", "t_train_n_gpus"]))
    k = state["params"]["bert"]["encoder"]["layer"]["0"]["intermediate"][
        "dense"]["kernel"]
    assert len(k.sharding.mesh.devices.flatten()) == 2


def test_train_continue_from_reference_ckpt(cli_world):
    """-continue with a reference-format .ckpt (not a native dir) resumes
    with Adam moments + schedule restored (reference train.py:371-386)."""
    from unimm_tpu.cli import train
    os.chdir(cli_world["root"])
    ckpt_dir = os.path.join(cli_world["root"], "ckpt", "t_train")
    name = [f for f in os.listdir(ckpt_dir) if f.endswith(".ckpt")][0]
    saved_iter = int(name.rsplit("_", 1)[1].split(".")[0])
    state = train.main(_argv(cli_world, [
        "-overfit", "-num_epochs", "1", "-batch_size", "12",
        "-sequences_per_image", "6", "-num_negative_samples", "1",
        "-eval_every_epochs", "5", "-continue",
        "-start_path", os.path.join(ckpt_dir, name),
        "-save_name", "t_cont_ref"]))
    assert int(np.asarray(state["step"])) > saved_iter
    from unimm_tpu import checkpoint as C
    _mu, _nu, count = C.extract_adam_moments(state["opt_state"],
                                             state["params"])
    assert count > 0


def test_train_cli_length_bucketed_accumulation(cli_world):
    """-batch_multiply 2 -length_buckets 1: the loop buffers pairs of
    flats IN-LOOP (6 fixture images / 2 per batch = 3 batches per epoch:
    one pair + one epoch-end remainder flush), re-sorts them into bucketed
    morsels, and still steps/learns/saves."""
    from unimm_tpu.cli import train
    os.chdir(cli_world["root"])
    state = train.main(_argv(cli_world, [
        "-num_epochs", "2", "-batch_size", "12",
        "-sequences_per_image", "6", "-num_negative_samples", "1",
        "-batch_multiply", "2", "-length_buckets", "1",
        "-eval_every_epochs", "100", "-save_every_epochs", "2",
        "-save_name", "t_train_lb"]))
    # 2 epochs x 3 loader batches (2 images each, drop_last) -> 6
    # micro-steps: per epoch one buffered pair + one remainder flush
    assert int(np.asarray(state["step"])) == 6
    ckpt_dir = os.path.join(cli_world["root"], "ckpt", "t_train_lb")
    assert any(f.endswith(".ckpt") for f in os.listdir(ckpt_dir))


def test_train_auto_resume(cli_world):
    """-auto_resume: first launch starts fresh (no checkpoint yet), an
    IDENTICAL relaunch resumes from the saved native state — the preempted
    TPU-job restart pattern (no argv editing between launches; the
    reference's recovery is manual -continue, SURVEY §5)."""
    from unimm_tpu.cli import train
    os.chdir(cli_world["root"])
    args = _argv(cli_world, [
        "-overfit", "-num_epochs", "1", "-batch_size", "12",
        "-sequences_per_image", "6", "-num_negative_samples", "1",
        "-eval_every_epochs", "99", "-save_name", "t_autoresume",
        "-auto_resume"])
    state1 = train.main(args)
    step1 = int(np.asarray(state1["step"]))
    assert step1 > 0
    state2 = train.main(args)
    step2 = int(np.asarray(state2["step"]))
    assert step2 == 2 * step1, (step1, step2)


def test_auto_resume_requires_save_name():
    """Without -save_name the save_path is timestamped per launch, so a
    relaunch could never find the previous run — refuse loudly."""
    import pytest as _pytest
    from unimm_tpu.cli import options
    with _pytest.raises(SystemExit):
        options.read_command_line(["-auto_resume"])


def test_dense_finetune_auto_resume(cli_world):
    """Dense phase full-state resume (reference
    dense_annotation_finetuning.py:95-130,324-326): the per-epoch .ckpt now
    carries optimizer + scheduler state, and an identical -auto_resume
    relaunch restores it and continues from the saved iter_id."""
    from unimm_tpu.cli import dense_finetune
    os.chdir(cli_world["root"])
    args = _argv(cli_world, [
        "-num_epochs", "2", "-batch_multiply", "1",
        "-save_name", "t_dense_ar", "-auto_resume"])
    state1 = dense_finetune.main(args)            # fresh start
    step1 = int(np.asarray(state1["step"]))       # 2 epochs x 6 dialogs
    assert step1 == 12
    ckpt_dir = os.path.join(cli_world["root"], "ckpt", "t_dense_ar")
    cks = sorted(f for f in os.listdir(ckpt_dir) if f.endswith(".ckpt"))
    # epoch-boundary save (6) + the auto_resume final-budget save (12):
    # without the latter an auto-relauncher would redo the tail epoch forever
    assert cks == ["visdial_dialog_encoder_12.ckpt",
                   "visdial_dialog_encoder_6.ckpt"], cks
    import torch
    blob = torch.load(os.path.join(ckpt_dir, cks[0]), map_location="cpu",
                      weights_only=False)
    assert "optimizer_state_dict" in blob and "scheduler_state_dict" in blob
    before = {f: open(os.path.join(ckpt_dir, f), "rb").read() for f in cks}
    state2 = dense_finetune.main(args)            # relaunch of a COMPLETE run
    step2 = int(np.asarray(state2["step"]))
    # idempotent: the budget is met, so the relaunch restores and does NOTHING
    assert step2 == 12, (step1, step2)
    for f, b in before.items():
        assert open(os.path.join(ckpt_dir, f), "rb").read() == b, f


def test_train_kill9_then_auto_resume(tmp_path):
    """Real preemption drill (the reference has no recovery story beyond
    manual -continue, SURVEY §5): SIGKILL a training run after its first
    epoch checkpoint lands, relaunch the IDENTICAL command with
    -auto_resume, and require it to restore the latest native state and
    finish the remaining epochs."""
    import signal
    import subprocess
    import sys
    import time as _time

    from tests import fixtures

    root = str(tmp_path)
    paths, tok, reader = fixtures.write_fixture_tree(root)
    model_cfg = os.path.join(root, "tiny_model.json")
    with open(model_cfg, "w") as f:
        json.dump(TINY_MODEL_JSON, f)

    argv = [
        "-visdial_processed_train", paths["visdial_processed_train"],
        "-visdial_processed_val", paths["visdial_processed_val"],
        "-visdial_processed_test", paths["visdial_processed_test"],
        "-visdial_processed_train_dense", paths["visdial_processed_train_dense"],
        "-visdial_processed_train_dense_annotations",
        paths["visdial_processed_train_dense_annotations"],
        "-visdial_processed_val_dense_annotations",
        paths["visdial_processed_val_dense_annotations"],
        "-visdial_image_feats", paths["visdial_image_feats"],  # on-disk npz
        "-vocab_path", paths["vocab_path"],
        "-model_config", model_cfg,
        "-max_seq_len", "96", "-num_options", "20", "-num_workers", "2",
        "-eval_chunk", "64", "-dtype", "float32",
        "-save_path", os.path.join(root, "ckpt"),
        "-language_weights", "/nonexistent",
        "-num_epochs", "3", "-batch_size", "12", "-sequences_per_image", "6",
        "-num_negative_samples", "1", "-eval_every_epochs", "99",
        "-save_name", "kill9", "-auto_resume",
    ]
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "jax.config.update('jax_compilation_cache_dir', '/tmp/jax_test_cache'); "
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0); "
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0); "
        "import numpy as np; from unimm_tpu.cli import train; "
        f"s = train.main({argv!r}); "
        "print('FINAL_STEP', int(np.asarray(s['step'])), flush=True)"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt_glob = os.path.join(root, "ckpt", "kill9")

    log1 = os.path.join(root, "run1.log")
    # file-backed stdout: a PIPE nobody drains fills with XLA warnings and
    # blocks the subprocess before it ever reaches the checkpoint
    with open(log1, "wb") as lf:
        p1 = subprocess.Popen([sys.executable, "-c", code], cwd=repo,
                              stdout=lf, stderr=subprocess.STDOUT)
        try:
            # wait for epoch 1's reference .ckpt (written AFTER the native
            # orbax save, so the native state is complete once it appears)
            deadline = _time.time() + 1500   # cold 1-cpu compile headroom
            while _time.time() < deadline:
                if os.path.isdir(ckpt_glob) and any(
                        f.endswith(".ckpt") for f in os.listdir(ckpt_glob)):
                    break
                if p1.poll() is not None:
                    out = open(log1).read()
                    raise AssertionError(f"run 1 exited early:\n{out[-3000:]}")
                _time.sleep(0.5)
            else:
                out = open(log1).read()
                raise AssertionError(
                    f"run 1 never produced a checkpoint:\n{out[-3000:]}")
        finally:
            if p1.poll() is None:
                p1.send_signal(signal.SIGKILL)
            p1.wait(timeout=60)

    out2 = subprocess.run([sys.executable, "-c", code], cwd=repo, timeout=1500,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT
                          ).stdout.decode()
    assert "restored native checkpoint at step " in out2, out2[-3000:]
    restored = int(out2.split("restored native checkpoint at step ")[1]
                   .split()[0])
    final = int(out2.split("FINAL_STEP ")[1].split()[0])
    # 6 train dialogs / (12 seqs / 6 per image) = 3 iters per epoch; the
    # relaunch completes the ORIGINAL 3-epoch budget (9 steps total), not
    # 3 more epochs on top of the restored step
    assert restored >= 3 and final == 9, (restored, final)
