#!/bin/bash
# Download the Shelf and Campus evaluation datasets.
#
# Usage: scripts/download_shelf_campus.sh <data_root>
# Calibrations ship with this repo (data/Shelf, data/Campus); this fetches
# images + GT. The offline 2D predictions
# (pred_shelf_maskrcnn_hrnet_coco.pkl / pred_campus_...) come from the
# VoxelPose release assets.
set -euo pipefail

DATA_ROOT="${1:-data}"
mkdir -p "$DATA_ROOT/Shelf" "$DATA_ROOT/Campus"

echo "=== Shelf"
curl -L -o /tmp/Shelf.tar.bz2 \
  https://www.campar.in.tum.de/public_datasets/2014_cvpr_belagiannis/Shelf.tar.bz2
tar -xjf /tmp/Shelf.tar.bz2 -C "$DATA_ROOT"

echo "=== Campus"
curl -L -o /tmp/CampusSeq1.tar.bz2 \
  https://www.campar.in.tum.de/public_datasets/2014_cvpr_belagiannis/CampusSeq1.tar.bz2
tar -xjf /tmp/CampusSeq1.tar.bz2 -C "$DATA_ROOT"
if [ -d "$DATA_ROOT/CampusSeq1" ]; then
  cp -r "$DATA_ROOT/CampusSeq1/." "$DATA_ROOT/Campus/"
fi

echo "done. Offline 2D predictions + panoptic_training_pose.pkl are"
echo "distributed with the VoxelPose/Faster-VoxelPose releases; place them"
echo "under $DATA_ROOT/ as the configs expect."
