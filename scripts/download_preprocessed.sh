#!/bin/bash
# Fetch the preprocessed VisDial v1.0 data used by the reference
# (same artifacts as /root/reference/scripts/download_preprocessed.sh).
set -e
mkdir -p data/visdial
cd data/visdial
wget -c https://s3.amazonaws.com/visual-dialog/data/v1.0/2019/visdial_1.0_train_processed.json || true
wget -c https://s3.amazonaws.com/visual-dialog/data/v1.0/2019/visdial_1.0_val_processed.json || true
wget -c https://s3.amazonaws.com/visual-dialog/data/v1.0/2019/visdial_1.0_test_processed.json || true
wget -c https://s3.amazonaws.com/visual-dialog/data/v1.0/2019/visdial_1.0_train_dense_processed.json || true
wget -c https://s3.amazonaws.com/visual-dialog/data/v1.0/2019/visdial_1.0_train_dense_annotations_processed.json || true
wget -c https://s3.amazonaws.com/visual-dialog/data/v1.0/2019/visdial_1.0_val_dense_annotations_processed.json || true
echo "region features (LMDB): see the visdial-bert release; then optionally"
echo "convert to the pickle-free npz layout:"
echo "  python -m scripts.convert_features data/visdial/visdial_img_feat.lmdb data/visdial/features.npz"
