"""Convert the reference's region-feature LMDB to the pickle-free .npz layout.

Usage: python -m scripts.convert_features <in.lmdb> <out.npz> [limit]
"""
import sys

from unimm_tpu.data.features import convert_lmdb_to_npz

if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    limit = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    convert_lmdb_to_npz(src, dst, limit=limit)
    print("wrote", dst)
