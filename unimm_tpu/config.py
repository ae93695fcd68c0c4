"""Model configuration for the TPU-native UniMM-UL (ViLBERT two-stream) encoder.

Mirrors the semantics of the reference ``BertConfig``
(/root/reference/models/vilbert_dialog.py:131-274) and reads the same JSON
schema (/root/reference/config/bert_base_6layer_6conect.json) so that existing
configuration files work unchanged.  Implemented as a frozen dataclass so it
can be closed over by jitted functions as a static value.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class VilbertConfig:
    # --- text stream -------------------------------------------------------
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    # the fused NSP-pooling dropout is HARDCODED 0.1 in the reference
    # (BertPreTrainingHeads, vilbert_dialog.py:1056) independent of
    # hidden_dropout_prob; surfaced as a field so determinism tests can
    # zero every dropout site (tests/_multihost_morsel_worker.py)
    head_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    # --- vision stream -----------------------------------------------------
    v_feature_size: int = 2048
    v_target_size: int = 1601
    v_hidden_size: int = 1024
    v_num_hidden_layers: int = 6
    v_num_attention_heads: int = 8
    v_intermediate_size: int = 1024
    v_attention_probs_dropout_prob: float = 0.1
    v_hidden_act: str = "gelu"
    v_hidden_dropout_prob: float = 0.1
    v_initializer_range: float = 0.02
    # --- co-attention ------------------------------------------------------
    bi_hidden_size: int = 1024
    bi_num_attention_heads: int = 8
    v_biattention_id: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)
    t_biattention_id: Tuple[int, ...] = (6, 7, 8, 9, 10, 11)
    # --- misc (reference knobs; defaults match the shipped config) ---------
    predict_feature: bool = False
    fast_mode: bool = False
    fixed_v_layer: int = 0
    fixed_t_layer: int = 0
    in_batch_pairs: bool = False
    fusion_method: str = "mul"
    with_coattention: bool = True
    # --- TPU-native additions ----------------------------------------------
    max_seq_len: int = 256          # dialog sequence length (options.py:62)
    max_regions: int = 37           # region count incl. global <IMG> row
    # text-stream attention implementation:
    #   "xla"          — bias-based path fused by XLA
    #   "pallas"       — per-head fused kernel with in-kernel mask generation
    #                    (custom VJP; usable in training when dropout == 0)
    #   "pallas_block" — whole-sub-block kernels (QKV proj + attention +
    #                    out proj + residual + LN, and the fused FFN) on eval
    #                    paths; training goes through the differentiable
    #                    block kernel (custom VJP, in-kernel prob dropout —
    #                    unimm.encode use_block_train), falling back to XLA
    #                    only under CPU interpret with attention dropout > 0
    # Default == the CLI default (cli/options.py -attention_impl): library
    # and CLI users get the same production path. On CPU the kernels run in
    # interpret mode (slow but exact) — pass "xla" for CPU-bound work.
    attention_impl: str = "pallas_block"
    # under "pallas_block": also route text-stream FFNs (incl. the co-attn
    # layers' t-FFNs) through the fused FFN kernel. Ties XLA in isolation
    # but measured on the end-to-end evaluator (scripts/bench_e2e_ab.py)
    fused_ffn: bool = True
    # under "pallas_block": fuse the text side of the co-attention layers
    # (q2 attends k1/v1 + dense2 + residual + LN2) into one kernel.
    # Measured a wash on v5e (interleaved A/B 1.835 vs 1.848 d/s off) —
    # XLA batches the small [L, 37] co-probs fine; kept as an option
    fused_co: bool = False
    # rematerialise encoder layers in the backward pass (jax.checkpoint):
    # trades ~30% recompute for O(layers) less activation memory, enabling
    # the paper's 240-sequence training batch on a single 16GB chip
    remat: bool = False
    # training MLM loss path: "gathered" computes NLL at <=
    # max_train_label_positions gathered label positions via the
    # custom-VJP online softmax (no [N, L, vocab] logits in fwd OR bwd);
    # "dense" materialises full logits like the reference (exactness oracle)
    mlm_loss_impl: str = "gathered"
    # per-sequence label budget for the gathered path; 160 > the max answer
    # labels (~126) + a generous corrupted-context allowance (Binomial tail
    # of mask_prob=0.15 over <=254 tokens). Overflow would silently drop the
    # highest-position labels, so keep this comfortably above realistic use.
    max_train_label_positions: int = 160

    def __post_init__(self):
        assert len(self.v_biattention_id) == len(self.t_biattention_id)
        if self.v_biattention_id:
            assert max(self.v_biattention_id) < self.v_num_hidden_layers
            assert max(self.t_biattention_id) < self.num_hidden_layers
        assert self.hidden_size % self.num_attention_heads == 0
        assert self.v_hidden_size % self.v_num_attention_heads == 0
        assert self.bi_hidden_size % self.bi_num_attention_heads == 0
        assert self.fusion_method in ("mul", "sum")

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_dict(cls, d: dict) -> "VilbertConfig":
        fields = {f.name for f in dataclasses.fields(cls)}
        known = {}
        for k, v in d.items():
            if k == "pooling_method":       # reference JSON alias for fusion_method
                known["fusion_method"] = v
            elif k in fields:
                if isinstance(v, list):
                    v = tuple(v)
                known[k] = v
            # unknown keys (bi_intermediate_size, bi_attention_type, ...) are
            # accepted-and-ignored exactly like the reference from_dict
            # (vilbert_dialog.py:249-255 stores them but never reads them).
        return cls(**known)

    @classmethod
    def from_json_file(cls, path: str) -> "VilbertConfig":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def replace(self, **kw) -> "VilbertConfig":
        return dataclasses.replace(self, **kw)

    # -- derived -------------------------------------------------------------
    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def v_head_dim(self) -> int:
        return self.v_hidden_size // self.v_num_attention_heads

    @property
    def bi_head_dim(self) -> int:
        return self.bi_hidden_size // self.bi_num_attention_heads
