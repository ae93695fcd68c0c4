"""CLI flag parity: every flag the reference's options.py defines must be
accepted by our parser (the reference parser is imported as an oracle)."""

import sys

import pytest

sys.path.insert(0, "/root/reference")
ref_options = pytest.importorskip(
    "options", reason="reference checkout not available")

from unimm_tpu.cli import options as our_options  # noqa: E402


def _flags(parser):
    out = {}
    for action in parser._actions:
        for opt in action.option_strings:
            out[opt] = action
    return out


def test_every_reference_flag_is_accepted():
    # pass -save_name: the reference's timestamp fallback calls
    # random.randint(0, 10e6) with a float, which crashes on python 3.12
    ref_params = ref_options.read_command_line(["-save_name", "x"])
    ours = our_options.read_command_line(["-save_name", "x"])
    missing = [k for k in ref_params if k not in ours and k != "save_path"]
    assert not missing, f"reference params missing from our CLI: {missing}"


def test_reference_readme_invocations_parse():
    """The exact flag sets from the reference README train/eval recipes."""
    argvs = [
        # README.md:79 training recipe
        "-batch_size 240 -lr 2e-5 -image_lr 2e-5 -nsp_loss_coeff 1 "
        "-mask_prob 0.15 -sequences_per_image 6 -num_negative_samples 5 "
        "-neg_token_weight 1 -train_dis_rate 0.5 -save_name UniMM-UL".split(),
        # README.md:106 generative val
        "-val_dis 0 -n_gpus 2 -save_name gen_eval".split(),
        # README.md:133 discriminative test
        "-n_gpus 4 -test_dis 1 -save_name dis_eval".split(),
        # dense finetuning recipe
        "-batch_multiply 16 -lr 2e-5 -nsp_loss_coeff 1 "
        "-train_dis_rate 0.5".split(),
        # continue training
        "-continue -start_path checkpoints/model.ckpt".split(),
        "-overfit -enable_visdom 0 -visdom_env tmp".split(),
    ]
    for argv in argvs:
        params = our_options.read_command_line(argv)
        assert isinstance(params, dict) and params["save_path"]
