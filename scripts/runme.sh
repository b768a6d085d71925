#!/usr/bin/env bash
# Reference-UX driver (the repo family's runme.sh: prep -> train each model
# variant -> evaluate -> infer; SURVEY.md §1 L5). Everything runs on the
# synthetic stand-in datasets by default; point WORKSPACE/TFRECORDS at real
# data to reproduce the AudioSet protocol.
set -euo pipefail
cd "$(dirname "$0")/.."

WORKSPACE="${WORKSPACE:-workspace}"
CONFIG="${CONFIG:-audioset_multi_level}"
STEPS="${STEPS:-500}"

echo "== 1. dataset prep (pack to HDF5) =="
python -m mla_tpu prep --config="$CONFIG" --split=train --out="$WORKSPACE/train.h5" \
  ${TFRECORDS:+--tfrecords="$TFRECORDS"}
python -m mla_tpu prep --config="$CONFIG" --split=eval --out="$WORKSPACE/eval.h5"

echo "== 2. train each head variant (the reference's model comparison) =="
for VARIANT in avg_pool max_pool single_attention multi_attention multi_level_attention; do
  echo "--- $VARIANT ---"
  python -m mla_tpu train --config="$CONFIG" --workspace="$WORKSPACE/$VARIANT" \
    --set model.variant="$VARIANT" train.num_steps="$STEPS" \
          data.dataset=hdf5 data.hdf5_path="$WORKSPACE/train.h5" \
          data.eval_hdf5_path="$WORKSPACE/eval.h5"
done

echo "== 3. evaluate the flagship =="
python -m mla_tpu eval --config="$CONFIG" --workspace="$WORKSPACE/multi_level_attention" \
  --set data.dataset=hdf5 data.hdf5_path="$WORKSPACE/train.h5" \
        data.eval_hdf5_path="$WORKSPACE/eval.h5"

echo "== 4. parity harness =="
python -m mla_tpu parity

echo "done. scalars: $WORKSPACE/*/scalars.csv"
