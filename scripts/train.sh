#!/usr/bin/env bash
# Training launcher (reference: scripts/train.sh — same flags, same
# snapshot-and-run-from-exp-dir behaviour):
#   -p python interpreter   -d dataset dir under configs/
#   -c config name          -n experiment name
#   -w weight path          -r true -> resume from exp config + last ckpt
#   -g num devices (informational; JAX uses all visible devices)
set -e

PYTHON=python
TRAIN_CODE=${TRAIN_CODE:-train.py}
DATASET=s3dis
CONFIG="None"
EXP_NAME=debug
WEIGHT="None"
RESUME=false
DEVICES=""

while getopts "p:d:c:n:w:g:r:" opt; do
  case $opt in
    p) PYTHON=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    c) CONFIG=$OPTARG ;;
    n) EXP_NAME=$OPTARG ;;
    w) WEIGHT=$OPTARG ;;
    r) RESUME=$OPTARG ;;
    g) DEVICES=$OPTARG ;;
    *) echo "usage: $0 -d dataset -c config -n name [-p python] [-w weight] [-r true] [-g n]" >&2; exit 1 ;;
  esac
done

ROOT=$(cd "$(dirname "$0")/.." && pwd)
EXP_DIR=$ROOT/exp/$DATASET/$EXP_NAME
MODEL_DIR=$EXP_DIR/model
CODE_DIR=$EXP_DIR/code
CONFIG_FILE=$ROOT/configs/$DATASET/$CONFIG.py

echo "Experiment: $EXP_NAME  Dataset: $DATASET  Config: $CONFIG_FILE"

if [ "$RESUME" = "true" ]; then
  # resume re-reads the dumped config and the last checkpoint
  CONFIG_FILE=$EXP_DIR/config.py
  WEIGHT=$MODEL_DIR/model_last.ckpt
else
  mkdir -p "$MODEL_DIR" "$CODE_DIR"
  # snapshot the source tree and run from the snapshot (exact
  # reproducibility of the code that produced the experiment)
  rm -rf "$CODE_DIR" && mkdir -p "$CODE_DIR"
  tar -C "$ROOT" --exclude='__pycache__' --exclude='*.so' -cf - \
    ao_tpu tools configs native | tar -C "$CODE_DIR" -xf -
fi

export PYTHONPATH=$CODE_DIR:$PYTHONPATH
OPTIONS="save_path=$EXP_DIR"
if [ "$RESUME" = "true" ]; then
  OPTIONS="$OPTIONS resume=True weight=$WEIGHT"
elif [ "$WEIGHT" != "None" ]; then
  OPTIONS="$OPTIONS weight=$WEIGHT"
fi

exec $PYTHON "$CODE_DIR/tools/$TRAIN_CODE" \
  --config-file "$CONFIG_FILE" \
  ${DEVICES:+--num-devices "$DEVICES"} \
  --options $OPTIONS
