#!/bin/bash
# Download the PWC-Net (chairs) torch checkpoint into models/_pretrained_weights/.
set -e
cd "$(dirname "$0")"
mkdir -p ../models/_pretrained_weights
wget https://github.com/NVlabs/PWC-Net/raw/master/PyTorch/pwc_net_chairs.pth.tar
mv pwc_net_chairs.pth.tar ../models/_pretrained_weights
