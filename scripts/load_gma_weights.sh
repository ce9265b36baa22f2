#!/bin/bash
# Download GMA pretrained torch checkpoints into models/_pretrained_weights/.
set -e
cd "$(dirname "$0")"
mkdir -p ../models/_pretrained_weights
base_url=https://github.com/zacjiang/GMA/raw/2f1fd29468a86a354d44dd25d107930b3f175043/checkpoints/
for name in gma-kitti.pth gma-sintel.pth gma-things.pth gma-chairs.pth; do
    wget -L ${base_url}${name}
    mv -f $name ../models/_pretrained_weights/
done
