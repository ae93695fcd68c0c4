"""WordPiece tokenizer tests, including a parity check against HuggingFace's
BertTokenizer driven by the same local vocab file (no downloads)."""

import os

import pytest

from unimm_tpu.data.tokenizer import WordPieceTokenizer

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "cat", "sat", "on", "mat", "un", "##aff", "##able", "##ing",
         "runn", "run", "##s", ",", ".", "!", "'", "s", "a", "b", "c",
         "hello", "world", "2", "##0"]


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return WordPieceTokenizer.from_vocab_file(str(p))


def test_basic(tok):
    assert tok.tokenize("the cat sat on the mat") == \
        ["the", "cat", "sat", "on", "the", "mat"]
    assert tok.encode("the cat") == [5, 6]
    assert tok.cls_id == 2 and tok.sep_id == 3 and tok.mask_id == 4


def test_wordpiece_continuation(tok):
    assert tok.tokenize("unaffable") == ["un", "##aff", "##able"]
    assert tok.tokenize("running") == ["runn", "##ing"]
    assert tok.tokenize("runs") == ["run", "##s"]


def test_punctuation_lowercase_accents(tok):
    assert tok.tokenize("The cat, sat!") == ["the", "cat", ",", "sat", "!"]
    assert tok.tokenize("cät") == ["cat"]         # accent stripped via NFD
    assert tok.tokenize("cat's") == ["cat", "'", "s"]


def test_unknown(tok):
    assert tok.tokenize("xyzzyq") == ["[UNK]"]
    assert tok.tokenize("20") == ["2", "##0"]


def test_hf_parity_same_vocab(tok, tmp_path):
    """With an identical vocab file, our tokenizer matches HF BertTokenizer."""
    transformers = pytest.importorskip("transformers")
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n")
    hf = transformers.BertTokenizer(str(vocab_file), do_lower_case=True)
    for text in ["the cat sat on the mat", "Unaffable running!", "cat's mat,",
                 "hello world. runs", "xyzzyq 20", "the  cat\tsat\n on"]:
        assert tok.tokenize(text) == hf.tokenize(text), text
        assert tok.encode(text) == hf.convert_tokens_to_ids(
            hf.tokenize(text)), text
