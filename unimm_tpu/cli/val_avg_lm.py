"""Generative ranking by token-averaged log-likelihood
(/root/reference/val_avg_lm.py:120-148: nll.sum / token count)."""

import sys

from unimm_tpu.cli import val_lm


def main(argv=None):
    return val_lm.main(argv, mode="ll_mean")


if __name__ == "__main__":
    main(sys.argv[1:])
