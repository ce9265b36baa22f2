#!/bin/bash
# Download SpyNet per-layer weight files into
# models/_pretrained_weights/spynet_weights/ (modelL{level}_{model}-{conv}-*.pth.tar).
set -e
cd "$(dirname "$0")"
mkdir -p ../models/_pretrained_weights/spynet_weights
git clone https://github.com/anuragranj/flowattack.git temp
mv temp/models/spynet_models/* ../models/_pretrained_weights/spynet_weights/
rm -rf temp
