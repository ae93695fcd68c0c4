#!/bin/bash
# Fetch the bert-base-uncased WordPiece vocabulary for the self-contained
# tokenizer (no transformers download needed at runtime).
set -e
mkdir -p config
wget -c -O config/vocab.txt https://huggingface.co/bert-base-uncased/resolve/main/vocab.txt
