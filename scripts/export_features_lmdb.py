"""Export the pickle-free .npz feature layout back to a reference-format
LMDB environment (the reciprocal of scripts/convert_features.py), so data
prepared for this framework stays usable by the reference's
utils/image_features_reader.py.

Usage: python -m scripts.export_features_lmdb <in.npz> <out.lmdb>
"""
import sys

from unimm_tpu.data.features import convert_npz_to_lmdb

if __name__ == "__main__":
    convert_npz_to_lmdb(sys.argv[1], sys.argv[2])
    print("wrote", sys.argv[2])
