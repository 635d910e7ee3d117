#!/usr/bin/env bash
# Fetch the three SOD benchmarks into the directory layout the datasets
# expect (ref directory conventions: datasets/duts.py:29-30,
# datasets/dut_omron.py:17-18, datasets/ecssd.py:17-18).
#
# Usage: scripts/download_datasets.sh [DIR]   (default: ./datasets)
set -euo pipefail
DIR="${1:-datasets}"
mkdir -p "$DIR"
cd "$DIR"

echo "== DUTS (train + test) =="
mkdir -p DUTS && cd DUTS
curl -LO http://saliencydetection.net/duts/download/DUTS-TR.zip
curl -LO http://saliencydetection.net/duts/download/DUTS-TE.zip
unzip -q DUTS-TR.zip && unzip -q DUTS-TE.zip
[ -d DUTS-TR/DUTS-TR-Image ] && mv DUTS-TR/DUTS-TR-Image DUTS-TR-Image && mv DUTS-TR/DUTS-TR-Mask DUTS-TR-Mask || true
[ -d DUTS-TE/DUTS-TE-Image ] && mv DUTS-TE/DUTS-TE-Image DUTS-TE-Image && mv DUTS-TE/DUTS-TE-Mask DUTS-TE-Mask || true
cd ..

echo "== ECSSD =="
mkdir -p ECSSD && cd ECSSD
curl -LO https://www.cse.cuhk.edu.hk/leojia/projects/hsaliency/data/ECSSD/images.zip
curl -LO https://www.cse.cuhk.edu.hk/leojia/projects/hsaliency/data/ECSSD/ground_truth_mask.zip
unzip -q images.zip && unzip -q ground_truth_mask.zip
cd ..

echo "== DUT-OMRON =="
mkdir -p DUTS-OMRON && cd DUTS-OMRON
curl -LO http://saliencydetection.net/dut-omron/download/DUT-OMRON-image.zip
curl -LO http://saliencydetection.net/dut-omron/download/DUT-OMRON-gt-pixelwise.zip.zip
unzip -q DUT-OMRON-image.zip
unzip -q DUT-OMRON-gt-pixelwise.zip.zip || true
cd ..

echo "done. Point dir_dataset at $PWD"
