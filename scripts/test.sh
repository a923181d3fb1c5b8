#!/usr/bin/env bash
# Testing launcher (reference contract: scripts/test.sh).
# Usage: sh scripts/test.sh -d <dataset> -n <exp-name> [-w <weight-name>]
set -e

ROOT=$(cd "$(dirname "$0")/.." && pwd)
DATASET=scannet
EXP_NAME=debug
WEIGHT=model_best

while getopts "p:d:n:w:g:" opt; do
  case $opt in
    p) PYTHON=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    n) EXP_NAME=$OPTARG ;;
    w) WEIGHT=$OPTARG ;;
    g) : ;;
    *) echo "usage: $0 -d dataset -n name [-w weight-name]"; exit 1 ;;
  esac
done
PYTHON=${PYTHON:-python}

EXP_DIR=$ROOT/exp/$DATASET/$EXP_NAME
CONFIG_FILE=$EXP_DIR/config.py

echo "Experiment: $EXP_DIR  weight: $WEIGHT"
exec $PYTHON "$ROOT/tools/test.py" --config-file "$CONFIG_FILE" \
  --options save_path="$EXP_DIR" weight="$EXP_DIR/model/$WEIGHT.pth"
