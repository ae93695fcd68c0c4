#!/bin/bash
# Fetch the VQA-pretrained ViLBERT starting weights the reference trains
# from (same artifact as /root/reference/scripts/download_checkpoints.sh),
# ready for -start_path: unimm_tpu/checkpoint.py::load_reference_ckpt reads
# the torch .ckpt/.bin formats directly (gamma/beta renames, prefixes,
# dict-intersection).
set -e
mkdir -p checkpoints-release
wget -c https://s3.amazonaws.com/visdial-bert/checkpoints/vqa_weights \
    -O checkpoints-release/vqa_pretrained_weights
echo "loaded with: python -m unimm_tpu.cli.train -start_path checkpoints-release/vqa_pretrained_weights ..."
