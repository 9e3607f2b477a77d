#!/bin/bash
# Download the CMU-Panoptic sequences used by the Panoptic configs
# (9 train + 4 validation, HD cameras) via the official panoptic-toolbox.
#
# Usage: scripts/download_panoptic.sh <data_dir>
# Requires: git, curl; ~350 GB of space for HD videos + extracted frames.
set -euo pipefail

DATA_DIR="${1:-data/Panoptic}"
SEQS=(
  160422_ultimatum1 160224_haggling1 160226_haggling1 161202_haggling1
  160906_ian1 160906_ian2 160906_ian3 160906_band1 160906_band2
  160906_pizza1 160422_haggling1 160906_ian5 160906_band4
)

mkdir -p "$DATA_DIR"
if [ ! -d "$DATA_DIR/panoptic-toolbox" ]; then
  git clone https://github.com/CMU-Perceptual-Computing-Lab/panoptic-toolbox \
    "$DATA_DIR/panoptic-toolbox"
fi

cd "$DATA_DIR"
for seq in "${SEQS[@]}"; do
  echo "=== $seq"
  # 0 VGA videos, 5 HD videos (the configs use 5 HD cameras)
  ./panoptic-toolbox/scripts/getData.sh "$seq" 0 5
  ./panoptic-toolbox/scripts/extractAll.sh "$seq"
done

echo "done. Next: python tools/preprocess.py --dataset panoptic --dir $DATA_DIR"
