#!/bin/bash
# End-to-end CLI drive on the real TPU: synthetic flagship-sized data ->
# train (fused differentiable kernels, remat, bf16) -> reference-format
# .ckpt -> val_lm ranking from that checkpoint. Validates the production
# train/eval pipeline on hardware (metrics are meaningless on synthetic
# data; the point is the full loop executes).
#
# Usage: bash scripts/cli_drive_tpu.sh [workdir=/tmp/cli_drive]
set -e
W=${1:-/tmp/cli_drive}
D=$W/data
REPO=$(cd "$(dirname "$0")/.." && pwd)
export PYTHONPATH=$REPO:/root/.axon_site
mkdir -p $W

# backend init HANGS (no exception) when the axon tunnel is down (CLAUDE.md)
# — probe with a bounded timeout instead of hanging the whole drive
if ! timeout 90 python -c "import jax, numpy as np; x = jax.numpy.ones((128, 128)); float(np.asarray(x @ x).sum())" >/dev/null 2>&1; then
  echo "cli_drive_tpu: TPU backend unreachable (tunnel down?) — aborting" >&2
  exit 1
fi

python - <<PY
import os, sys
sys.path.insert(0, "$REPO")
from tests import fixtures
root = "$D"
os.makedirs(root, exist_ok=True)
# flagship-sized features (the model config expects 2048-dim, 1601 classes)
fixtures.write_fixture_tree(root, n_train=6, n_val=3, n_test=2,
                            feat_dim=2048, n_classes=1601)
os.replace(os.path.join(root, "features.npz"),
           os.path.join(root, "features2048.npz"))
print("fixture tree ready:", root)
PY

COMMON="-visdial_processed_train $D/visdial_1.0_train_processed.json \
  -visdial_processed_val $D/visdial_1.0_val_processed.json \
  -visdial_processed_test $D/visdial_1.0_test_processed.json \
  -visdial_processed_train_dense $D/visdial_1.0_train_dense_processed.json \
  -visdial_processed_train_dense_annotations $D/visdial_1.0_train_dense_annotations_processed.json \
  -visdial_processed_val_dense_annotations $D/visdial_1.0_val_dense_annotations_processed.json \
  -visdial_image_feats $D/features2048.npz \
  -vocab_path $D/vocab.txt \
  -language_weights /root/reference/config/language_weights.json \
  -model_config $REPO/config/bert_base_6layer_6conect.json \
  -dtype bfloat16 -num_workers 2"

cd $W
python -m unimm_tpu.cli.train $COMMON \
  -batch_size 48 -sequences_per_image 6 -num_epochs 1 -overfit -remat 1 \
  -eval_every_epochs 100 -save_every_epochs 1 \
  -save_path $W/ckpt -save_name drive

python -m unimm_tpu.cli.val_lm $COMMON \
  -start_path $W/ckpt/drive/visdial_dialog_encoder_1.ckpt \
  -val_dis 0 -save_name drive_val

# phase-2 dense-annotation finetuning from the phase-1 checkpoint (the
# reference's two-stage recipe; one step -- checkpoints save at the
# reference's own cadence, iter % epoch == 0 && iter > 0)
python -m unimm_tpu.cli.dense_finetune $COMMON \
  -start_path $W/ckpt/drive/visdial_dialog_encoder_1.ckpt \
  -batch_multiply 2 -num_epochs 1 -overfit -remat 1 \
  -eval_every_epochs 100 -save_every_epochs 1 \
  -save_path $W/ckpt_dense -save_name dense
echo "CLI DRIVE OK: $(ls $W/drive_val_predictions.txt)"
