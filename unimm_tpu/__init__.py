"""unimm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) visual-dialog framework with
the full capabilities of UniMM-UL (ZihaoW123/UniMM, ACM MM'22)."""

from unimm_tpu.config import VilbertConfig

__all__ = ["VilbertConfig"]
__version__ = "0.1.0"
