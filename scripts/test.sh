#!/usr/bin/env bash
# Whole-scene testing launcher (reference: scripts/test.sh — same flags:
#   -p python  -d dataset  -c config (default: the experiment's dumped
#   config.py)  -n experiment name  -w weight name under exp/.../model/)
set -e

PYTHON=python
TEST_CODE=${TEST_CODE:-test.py}
DATASET=s3dis
CONFIG="None"
EXP_NAME=debug
WEIGHT=model_best

while getopts "p:d:c:n:w:" opt; do
  case $opt in
    p) PYTHON=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    c) CONFIG=$OPTARG ;;
    n) EXP_NAME=$OPTARG ;;
    w) WEIGHT=$OPTARG ;;
    *) echo "usage: $0 -d dataset -n name [-c config] [-w weight] [-p python]" >&2; exit 1 ;;
  esac
done

ROOT=$(cd "$(dirname "$0")/.." && pwd)
EXP_DIR=$ROOT/exp/$DATASET/$EXP_NAME
MODEL_DIR=$EXP_DIR/model
if [ "$CONFIG" = "None" ]; then
  CONFIG_FILE=$EXP_DIR/config.py   # the experiment's dumped config
else
  CONFIG_FILE=$ROOT/configs/$DATASET/$CONFIG.py
fi

echo "Experiment: $EXP_NAME  Dataset: $DATASET  Config: $CONFIG_FILE"
export PYTHONPATH=$ROOT:$PYTHONPATH

exec $PYTHON "$ROOT/tools/$TEST_CODE" \
  --config-file "$CONFIG_FILE" \
  --options save_path="$EXP_DIR" weight="$MODEL_DIR/$WEIGHT.ckpt"
