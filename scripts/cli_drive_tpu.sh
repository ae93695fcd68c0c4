#!/bin/bash
# End-to-end CLI drive on the real TPU under the PRODUCTION defaults:
# synthetic flagship-sized data -> train (fused differentiable kernels,
# no-remat accumulation microbatches, sorted length-bucketed morsels, bf16)
# with a mid-run SIGKILL + -auto_resume relaunch (preemption drill on
# hardware) -> reference-format .ckpt -> val_lm ranking (prefix-cache
# scorer + pipelined serving loop + eighth length buckets + fused answer
# kernel, all defaults) -> dense finetune. Validates the production
# train/eval pipeline on hardware (metrics are meaningless on synthetic
# data; the point is the full loop executes).
#
# Usage: bash scripts/cli_drive_tpu.sh [workdir=/tmp/cli_drive]
set -e -o pipefail
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
# phase 1: sparse train under the production fast recipe (no-remat
# accumulation microbatches + sorted length-bucketed morsels, defaults for
# kernels/buckets) with a REAL preemption: SIGKILL the run after its
# epoch-1 reference .ckpt lands (written after the native Orbax save, so
# the native state is complete), then relaunch the IDENTICAL command —
# -auto_resume restores epoch 1 and completes the original 2-epoch budget.
TRAIN_FLAGS="$COMMON -batch_size 48 -sequences_per_image 6 -batch_multiply 2 \
  -remat 0 -num_epochs 2 -overfit \
  -eval_every_epochs 100 -save_every_epochs 1 \
  -save_path $W/ckpt -save_name drive -auto_resume"
python -m unimm_tpu.cli.train $TRAIN_FLAGS > $W/train1.log 2>&1 &
echo $! > $W/train.pid
CKPT1=$W/ckpt/drive/visdial_dialog_encoder_1.ckpt
# a COLD compile cache can spend >45 min compiling before step 1 (CLAUDE.md:
# up to 8 bucketed Mosaic shapes per phase through the remote compile
# server) — default the poll deadline past that, override via env
DEADLINE=${CLI_DRIVE_CKPT_DEADLINE:-4500}
for i in $(seq 1 $DEADLINE); do
  [ -f "$CKPT1" ] && break
  if ! kill -0 $(cat $W/train.pid) 2>/dev/null; then
    echo "train run 1 exited before its epoch-1 checkpoint:" >&2
    tail -40 $W/train1.log >&2
    exit 1
  fi
  sleep 1
done
if [ ! -f "$CKPT1" ]; then
  echo "train run 1 never produced a checkpoint (timeout):" >&2
  tail -40 $W/train1.log >&2
  kill -9 $(cat $W/train.pid) 2>/dev/null || true
  exit 1
fi
# || true: on a tiny fixture the run can finish both epochs before the
# poll sees ckpt 1 — then the kill targets an exited pid and the relaunch
# is auto_resume's idempotent no-op (still a valid drill of the restart)
kill -9 $(cat $W/train.pid) 2>/dev/null || true
wait $(cat $W/train.pid) 2>/dev/null || true
echo "== preemption drill: SIGKILLED after epoch-1 ckpt; relaunching =="
python -m unimm_tpu.cli.train $TRAIN_FLAGS
test -f $W/ckpt/drive/visdial_dialog_encoder_2.ckpt

# phase 2: val_lm ranking from the resumed run's final checkpoint — the
# production serving path (prefix-cache scorer, pipelined loop, eighth
# length buckets, fused answer + label-head kernels are all defaults)
python -m unimm_tpu.cli.val_lm $COMMON \
  -start_path $W/ckpt/drive/visdial_dialog_encoder_2.ckpt \
  -val_dis 0 -save_name drive_val | tee $W/drive_val.log

# phase 2b: quality gate ON HARDWARE — the full convert->eval->assert loop
# of scripts/quality_gate.py (reference-.ckpt conversion, production val_lm
# eval, metric assertions) driven against a golden synthesized from phase
# 2's own metrics (print_metrics emits the reference's "name: value" log
# format). The real invocation swaps in the released checkpoint + the
# committed /root/reference/.../val_lm.log golden; this stage proves the
# gate's code path end-to-end on TPU every drive.
python $REPO/scripts/quality_gate.py --golden $W/drive_val.log $COMMON \
  -start_path $W/ckpt/drive/visdial_dialog_encoder_2.ckpt \
  -val_dis 0 -save_name drive_gate

# phase-2 dense-annotation finetuning from the phase-1 checkpoint (the
# reference's two-stage recipe; one step -- checkpoints save at the
# reference's own cadence, iter % epoch == 0 && iter > 0)
python -m unimm_tpu.cli.dense_finetune $COMMON \
  -start_path $W/ckpt/drive/visdial_dialog_encoder_2.ckpt \
  -batch_multiply 2 -num_epochs 1 -overfit -remat 1 \
  -eval_every_epochs 100 -save_every_epochs 1 \
  -save_path $W/ckpt_dense -save_name dense
echo "CLI DRIVE OK: $(ls $W/drive_val_predictions.txt)"
