#!/usr/bin/env bash
# Download the CMU Panoptic sequences used by the Panoptic profile
# (train: 9 sequences, val: 4 — see faster_voxelpose_tpu/datasets/panoptic.py)
# plus HD-frame extraction.  Requires wget + ffmpeg and ~500GB of space.
#
# Usage: scripts/download_panoptic.sh <data_dir>   (e.g. data/Panoptic)
set -euo pipefail

DATA_DIR=${1:?usage: $0 <data_dir>}
BASE_URL="http://domedb.perception.cs.cmu.edu/webdata/dataset"
# HD cameras used by the 5-view profile
CAMERAS=(00_03 00_06 00_12 00_13 00_23)
SEQUENCES=(
  160422_ultimatum1 160224_haggling1 160226_haggling1 161202_haggling1
  160906_ian1 160906_ian2 160906_ian3 160906_band1 160906_band2
  160906_pizza1 160422_haggling1 160906_ian5 160906_band4
)

mkdir -p "$DATA_DIR"
for SEQ in "${SEQUENCES[@]}"; do
  SEQ_DIR="$DATA_DIR/$SEQ"
  mkdir -p "$SEQ_DIR/hdVideos" "$SEQ_DIR/hdImgs"

  echo "=> $SEQ: calibration + 3D poses"
  wget -c "$BASE_URL/$SEQ/calibration_${SEQ}.json" -O "$SEQ_DIR/calibration_${SEQ}.json"
  wget -c "$BASE_URL/$SEQ/hdPose3d_stage1_coco19.tar" -O "$SEQ_DIR/hdPose3d.tar"
  tar -xf "$SEQ_DIR/hdPose3d.tar" -C "$SEQ_DIR" && rm "$SEQ_DIR/hdPose3d.tar"

  for CAM in "${CAMERAS[@]}"; do
    VIDEO="$SEQ_DIR/hdVideos/hd_${CAM}.mp4"
    echo "=> $SEQ: video $CAM"
    wget -c "$BASE_URL/$SEQ/videos/hd_shared_crf20/hd_${CAM}.mp4" -O "$VIDEO"

    OUT_DIR="$SEQ_DIR/hdImgs/$CAM"
    mkdir -p "$OUT_DIR"
    echo "=> $SEQ: extracting frames for $CAM"
    ffmpeg -nostdin -loglevel error -i "$VIDEO" -q:v 1 \
      "$OUT_DIR/${CAM}_%08d.jpg"
  done
done
echo "done. Next: python run/preprocess.py --cfg configs/panoptic/jln64.yaml"
