#!/usr/bin/env bash
# Training launcher (reference contract: scripts/train.sh): snapshots the
# code into the experiment dir and runs tools/train.py.
# Usage: sh scripts/train.sh -d <dataset> -c <config-name> -n <exp-name>
#        [-w <weight>] [-r true] [-g <num-devices>]
set -e

ROOT=$(cd "$(dirname "$0")/.." && pwd)
DATASET=scannet
CONFIG=config
EXP_NAME=debug
WEIGHT=""
RESUME=false
DEVICES=""

while getopts "p:d:c:n:w:g:r:" opt; do
  case $opt in
    p) PYTHON=$OPTARG ;;
    d) DATASET=$OPTARG ;;
    c) CONFIG=$OPTARG ;;
    n) EXP_NAME=$OPTARG ;;
    w) WEIGHT=$OPTARG ;;
    g) DEVICES=$OPTARG ;;
    r) RESUME=$OPTARG ;;
    *) echo "usage: $0 -d dataset -c config -n name [-w weight] [-r true]"; exit 1 ;;
  esac
done
PYTHON=${PYTHON:-python}

EXP_DIR=$ROOT/exp/$DATASET/$EXP_NAME
CODE_DIR=$EXP_DIR/code
CONFIG_FILE=$ROOT/configs/$DATASET/$CONFIG.py

echo "Experiment: $EXP_DIR"
mkdir -p "$EXP_DIR"
if [ "$RESUME" = true ] && [ -d "$CODE_DIR" ]; then
  echo "Resuming with snapshotted code in $CODE_DIR"
else
  echo "Snapshotting code -> $CODE_DIR"
  rm -rf "$CODE_DIR"
  mkdir -p "$CODE_DIR"
  cp -r "$ROOT/pointcloudpdf_tpu" "$ROOT/tools" "$ROOT/configs" "$CODE_DIR/"
fi

OPTIONS="save_path=$EXP_DIR"
if [ "$RESUME" = true ]; then
  OPTIONS="$OPTIONS resume=True weight=$EXP_DIR/model/model_last.pth"
elif [ -n "$WEIGHT" ]; then
  OPTIONS="$OPTIONS weight=$WEIGHT"
fi

cd "$CODE_DIR"
exec $PYTHON tools/train.py --config-file "$CONFIG_FILE" --options $OPTIONS
