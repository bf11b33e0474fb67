#!/usr/bin/env bash
# PP2S-label supervised training (reference: scripts/train_pp2s.sh, which
# differs from train.sh only in TRAIN_CODE — train_pp2s.sh:7).
TRAIN_CODE=train_pp2s.py exec bash "$(dirname "$0")/train.sh" "$@"
