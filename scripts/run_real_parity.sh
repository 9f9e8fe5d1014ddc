#!/usr/bin/env bash
# Turnkey real-data parity run: data/ + released checkpoints -> PARITY.md.
#
#   scripts/download_panoptic.sh && scripts/download_shelf_campus.sh
#   # place the model-zoo checkpoints (Google Drive links in
#   # /root/reference/README.md:123-131) under weights/:
#   #   weights/panoptic_model_best.pth.tar
#   #   weights/shelf_model_best.pth.tar
#   #   weights/campus_model_best.pth.tar
#   # and the pose ResNet-50 under backbone/pose_resnet50_panoptic.pth.tar
#   scripts/run_real_parity.sh
#
# The python driver skips any dataset whose data or checkpoint is absent
# and records the gap in PARITY.md instead of failing.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python scripts/run_real_parity.py --preprocess "$@"
