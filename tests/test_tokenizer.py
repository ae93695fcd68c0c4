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


# ---------------------------------------------------------------------------
# Unicode property-fuzz vs the HuggingFace implementation (the executable
# oracle for bert-base-uncased semantics; the real 30522-entry vocab.txt
# cannot exist in this zero-egress environment — scripts/download_vocab.sh).
# The vocab below is synthetic but rich: single chars + ## continuations for
# the full ascii alphabet and digits, common words/pieces, CJK singles, and
# the accent-stripped forms, so fuzz outputs are far from all-[UNK].
# ---------------------------------------------------------------------------

FUZZ_VOCAB = (
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    + [c for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
    + ["##" + c for c in "abcdefghijklmnopqrstuvwxyz0123456789"]
    + ["the", "cat", "dog", "is", "on", "running", "run", "##ning", "##ing",
       "un", "##aff", "##able", "hello", "world", "naive", "cafe", "uber",
       "##s", "##ed", "##er", "2020", "##00"]
    + list(",.!?;:'\"()[]{}<>@#$%^&*-_=+/\\|~`")
    + ["中", "国", "语", "文", "日", "本", "한"]  # CJK singles (한 is Hangul)
)


def _fuzz_corpus():
    import random
    rng = random.Random(20260817)
    ascii_words = ["the", "cat", "dog", "running", "unaffable", "hello",
                   "world", "xyzzyq", "a", "ab", "abc", "2020", "42",
                   "don't", "e-mail", "cafe", "test.com"]
    accents = ["café", "naïve", "über", "résumé", "piñata", "Ĉapelo",
               "ēlan", "ùvwx"]
    cjk = ["中国", "日本語", "中a国b", "文中is文", "한국"]
    weird = ["​", " ", " ", "\x00", "�", "\x07",
             "́", "é", "\U0001F600", "　"]
    greek_cyr = ["αβγ", "Москва", "δcatε"]
    pieces = ascii_words + accents + cjk + weird + greek_cyr + [
        "a" * 99, "b" * 100, "c" * 101,       # max_chars_per_word boundary
        "", " ", "  \t\n ", "....", "!!??", "a,b.c!d",
    ]
    corpus = list(pieces)
    for _ in range(400):
        n = rng.randint(1, 6)
        sep = rng.choice([" ", "  ", "\t", "\n", ""])
        corpus.append(sep.join(rng.choice(pieces) for _ in range(n)))
    return corpus


def test_hf_parity_fuzz_unicode(tmp_path):
    """500+ fuzz strings (CJK, Hangul, accents, control chars, zero-width,
    combining marks, emoji, NBSP, 100-char words, mixed scripts) must
    tokenize EXACTLY like HuggingFace's BertTokenizer over the same vocab."""
    transformers = pytest.importorskip("transformers")
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(FUZZ_VOCAB) + "\n", encoding="utf-8")
    ours = WordPieceTokenizer.from_vocab_file(str(vocab_file))
    hf = transformers.BertTokenizer(str(vocab_file), do_lower_case=True)
    mismatches = []
    for s in _fuzz_corpus():
        a = ours.tokenize(s)
        b = hf.tokenize(s)
        if a != b:
            mismatches.append((repr(s), a, b))
    assert not mismatches, mismatches[:10]


def test_hf_parity_fuzz_encode_ids(tmp_path):
    """Same fuzz corpus at the id level (convert_tokens_to_ids parity)."""
    transformers = pytest.importorskip("transformers")
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(FUZZ_VOCAB) + "\n", encoding="utf-8")
    ours = WordPieceTokenizer.from_vocab_file(str(vocab_file))
    hf = transformers.BertTokenizer(str(vocab_file), do_lower_case=True)
    for s in _fuzz_corpus()[:200]:
        assert ours.encode(s) == hf.convert_tokens_to_ids(hf.tokenize(s)), s
