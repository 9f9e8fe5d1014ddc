#!/usr/bin/env bash
# Download the Shelf and Campus multi-view test sets (MPII MV3DHP hosting).
# The precomputed Mask R-CNN + HRNet 2D predictions and the shared
# calibration JSONs come from the Faster-VoxelPose release assets; the
# Panoptic pose bank (panoptic_training_pose.pkl) is needed for synthetic
# training — place it at <data_root>/panoptic_training_pose.pkl.
#
# Usage: scripts/download_shelf_campus.sh <data_root>   (e.g. data)
set -euo pipefail

DATA_ROOT=${1:?usage: $0 <data_root>}

echo "=> Shelf"
mkdir -p "$DATA_ROOT/Shelf"
wget -c "https://www.campar.in.tum.de/public_datasets/2014_cvpr_belagiannis/Shelf.tar.bz2" \
  -O "$DATA_ROOT/Shelf.tar.bz2"
tar -xjf "$DATA_ROOT/Shelf.tar.bz2" -C "$DATA_ROOT" && rm "$DATA_ROOT/Shelf.tar.bz2"

echo "=> Campus"
mkdir -p "$DATA_ROOT/Campus"
wget -c "https://www.campar.in.tum.de/public_datasets/2014_cvpr_belagiannis/CampusSeq1.tar.bz2" \
  -O "$DATA_ROOT/Campus.tar.bz2"
tar -xjf "$DATA_ROOT/Campus.tar.bz2" -C "$DATA_ROOT" && rm "$DATA_ROOT/Campus.tar.bz2"

cat <<'EOF'
done. Also required (from the upstream Faster-VoxelPose release assets):
  <data_root>/Shelf/pred_shelf_maskrcnn_hrnet_coco.pkl
  <data_root>/Shelf/calibration_shelf.json
  <data_root>/Campus/pred_campus_maskrcnn_hrnet_coco.pkl
  <data_root>/Campus/calibration_campus.json
  <data_root>/panoptic_training_pose.pkl
EOF
