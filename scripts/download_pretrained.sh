#!/usr/bin/env bash
# Fetch the self-supervised backbone checkpoints the reference consumes
# (ref utils/misc.py:230-246 DINO URLs; networks/resnet.py:20-47
# MoCo-v2/SwAV paths).  Convert at load time via sod_tpu.models.convert.
set -euo pipefail
DIR="${1:-pretrained}"
mkdir -p "$DIR" && cd "$DIR"

# DINO ViT-S (patch 8 is the live config; patch 16 also supported)
curl -LO https://dl.fbaipublicfiles.com/dino/dino_deitsmall8_300ep_pretrain/dino_deitsmall8_300ep_pretrain.pth
curl -LO https://dl.fbaipublicfiles.com/dino/dino_deitsmall16_pretrain/dino_deitsmall16_pretrain.pth

# MoCo v2 (800ep) + SwAV ResNet-50 for pseudo-mask features
curl -LO https://dl.fbaipublicfiles.com/moco/moco_checkpoints/moco_v2_800ep/moco_v2_800ep_pretrain.pth.tar
curl -LO https://dl.fbaipublicfiles.com/deepcluster/swav_800ep_pretrain.pth.tar

echo "done -> $PWD"
