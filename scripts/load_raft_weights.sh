#!/bin/bash
# Download RAFT pretrained torch checkpoints (raft-sintel.pth etc.) into
# models/_pretrained_weights/. Same source as the reference implementation;
# pcfa_tpu converts them to Flax params at load time (models/convert.py).
set -e
cd "$(dirname "$0")"
mkdir -p ../models/_pretrained_weights
wget https://www.dropbox.com/s/4j4z58wuv8o0mfz/models.zip
unzip models.zip -d ../models/_pretrained_weights
mv ../models/_pretrained_weights/models/* ../models/_pretrained_weights
rm models.zip
rm -r ../models/_pretrained_weights/models
