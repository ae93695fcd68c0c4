"""Device-side attention-mask construction from compact per-sequence descriptors.

The reference framework builds dense ``[256, 256]`` int mask matrices on the
host for every sequence (/root/reference/utils/data_utils.py:139-288 generative,
:291-428 discriminative) and ships them with each batch — O(L^2) host->HBM
traffic per sequence, plus a ``[rounds, options, 37, 256]`` repeat of the
co-attention mask (/root/reference/dataloader/dataloader_visdial.py:319).

The TPU-native design ships FOUR scalars per sequence instead and regenerates
the masks on device (vectorised jnp here; fused in-kernel in the Pallas
attention path):

    mode     : 0 = discriminative, 1 = generative (autoregressive-MLM)
    ctx_end  : dis -> total real length L;  gen -> L1 = context + first answer
               copy + its [SEP] ("orig_length" in the reference encoder)
    ans_len  : gen -> answer length + 1 (incl. trailing [SEP]), the
               "last_len" of the reference; dis -> 0
    (max_len is static)

Mask semantics replicated exactly, including the quirks:

* dis (data_utils.py:300,353-354): mask starts from ZEROS; M[i,j] = (i<L)&(j<L).
  Padding rows are all-zero (uniform softmax; those rows are never read).
* gen (data_utils.py:149-151,199-210): mask starts from IDENTITY; with
  L1=ctx_end, A=ans_len, T=min(L1+A, max_len):
    - row 0 ([CLS]) attends [0, T)                              (:202)
    - context rows i in [1, L1-A) attend cols [1, L1-A) + self  (:203)
      (NOTE: context rows do NOT attend the [CLS] column)
    - first-copy rows i in [L1-A, L1) attend cols [1, i]        (:204, causal_mask2)
    - masked-copy rows i in [L1, T) attend cols [1, i-A) + self (:206/:209, causal_mask)
    - rows >= T are all-zero                                    (:207)
* co-attention text mask (columns of text the image stream may attend):
    dis -> [0, L)      (data_utils.py:353)
    gen -> [1, L1-A)   (data_utils.py:210)  — hides [CLS] and BOTH answer copies
  Per BertBiAttention (vilbert_dialog.py:655-709) this is applied ONLY to
  image-attending-text scores (attended_all_tensor2=False) while
  text-attending-image uses only the image padding mask
  (attended_all_tensor1=True) and the text padding mask add is disabled (:706).

Position ids are likewise derivable from the descriptor
(data_utils.py:194,227: second answer copy reuses the first copy's positions).
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -10000.0  # additive-mask fill value, matching vilbert_dialog.py:1418


def text_attention_mask(mode, ctx_end, ans_len, max_len: int):
    """Boolean [.., max_len, max_len] self-attention mask from descriptors.

    Args:
      mode, ctx_end, ans_len: int32 arrays of identical leading shape ``[...]``.
      max_len: static sequence length.
    Returns:
      bool array ``[..., max_len, max_len]``; True = may attend.
    """
    mode = jnp.asarray(mode)[..., None, None]
    L = jnp.asarray(ctx_end)[..., None, None]
    A = jnp.asarray(ans_len)[..., None, None]
    i = jnp.arange(max_len, dtype=jnp.int32)[:, None]
    j = jnp.arange(max_len, dtype=jnp.int32)[None, :]

    dis = (i < L) & (j < L)

    T = jnp.minimum(L + A, max_len)
    Lc = L - A                      # context end (exclusive of first copy)
    diag = i == j
    row0 = (i == 0) & (j < T)
    ctx_rows = (i >= 1) & (i < Lc) & (((j >= 1) & (j < Lc)) | diag)
    first_copy = (i >= Lc) & (i < L) & (j >= 1) & (j <= i)
    second_copy = (i >= L) & (i < T) & (((j >= 1) & (j < i - A)) | diag)
    gen = row0 | ctx_rows | first_copy | second_copy

    return jnp.where(mode == 0, dis, gen)


def co_text_mask(mode, ctx_end, ans_len, max_len: int):
    """Boolean [..., max_len] mask of text columns visible to the image stream."""
    mode = jnp.asarray(mode)[..., None]
    L = jnp.asarray(ctx_end)[..., None]
    A = jnp.asarray(ans_len)[..., None]
    j = jnp.arange(max_len, dtype=jnp.int32)
    dis = j < L
    gen = (j >= 1) & (j < L - A)
    return jnp.where(mode == 0, dis, gen)


def position_ids(mode, ctx_end, ans_len, max_len: int):
    """int32 [..., max_len] position ids; gen second copy reuses first-copy ids."""
    mode = jnp.asarray(mode)[..., None]
    L = jnp.asarray(ctx_end)[..., None]
    A = jnp.asarray(ans_len)[..., None]
    i = jnp.arange(max_len, dtype=jnp.int32)
    T = jnp.minimum(L + A, max_len)
    dis = jnp.where(i < L, i, 0)
    gen = jnp.where(i < L, i, jnp.where(i < T, i - A, 0))
    return jnp.where(mode == 0, dis, gen).astype(jnp.int32)


def to_additive(mask_bool, dtype=jnp.float32):
    """(1 - mask) * -10000 additive bias, as in vilbert_dialog.py:1415-1431."""
    return jnp.where(mask_bool, jnp.array(0.0, dtype), jnp.array(NEG_INF, dtype))


def text_self_bias(mode, ctx_end, ans_len, max_len: int, dtype=jnp.float32):
    """[..., 1, max_len, max_len] additive bias for text self-attention."""
    return to_additive(
        text_attention_mask(mode, ctx_end, ans_len, max_len), dtype
    )[..., None, :, :]


def image_self_bias(image_mask, dtype=jnp.float32):
    """[..., 1, 1, R] additive bias from a [..., R] region padding mask."""
    return to_additive(jnp.asarray(image_mask) > 0, dtype)[..., None, None, :]


def co_attention_bias(mode, ctx_end, ans_len, max_len: int, dtype=jnp.float32):
    """[..., 1, 1, max_len] additive bias for image-attends-text scores.

    The reference materialises this as [37, 256] per sequence
    (dataloader_visdial.py:319); it is constant over the region axis, so a
    single broadcastable row is sufficient.
    """
    return to_additive(co_text_mask(mode, ctx_end, ans_len, max_len), dtype)[
        ..., None, None, :
    ]


def attended_extent(mode, ctx_end, ans_len, max_len: int, mlm_labels=None):
    """Host-side (numpy) per-sequence attended extent: the first row/column
    index beyond which the self-attention mask is ALL ZERO.

    dis: ctx_end (rows/cols >= L are never attended); gen: ctx_end +
    ans_len (rows >= T are all-zero and no valid row attends past T).
    When ``mlm_labels`` is given, label positions bound the extent too — a
    guard for synthetic inputs; real labels always sit inside it. Used by
    the length-bucketed evaluator and training morsels: scoring/training a
    sequence at any padded length >= its extent is exact under the masks.
    """
    import numpy as np

    mode = np.asarray(mode)
    ext = np.where(mode == 0, np.asarray(ctx_end),
                   np.asarray(ctx_end) + np.asarray(ans_len))
    if mlm_labels is not None:
        labs = np.asarray(mlm_labels)
        ext = np.maximum(ext, ((labs != -1) *
                               np.arange(1, labs.shape[-1] + 1)).max(-1))
    return np.clip(ext, 1, max_len)


def quarter_bucket(ext_max: int, max_len: int, div: int = 4) -> int:
    """Smallest multiple of max_len/div covering ``ext_max`` (== max_len
    when max_len is not divisible by div) — the shared length-bucket
    rule. div bounds the number of compiled executables per
    (chunk, label-bucket) point."""
    if max_len % div:
        return max_len
    q = max_len // div
    return min(-(-max(int(ext_max), 1) // q) * q, max_len)
