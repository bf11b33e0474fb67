#!/usr/bin/env bash
# REAL (SAM-in-the-loop) training (reference: scripts/train_real.sh, which
# differs from train.sh only in TRAIN_CODE).
TRAIN_CODE=train_real.py exec bash "$(dirname "$0")/train.sh" "$@"
