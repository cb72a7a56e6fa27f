#!/bin/bash
# Fetch ImageNet pretrained backbones (reference
# data/scripts/fetch_faster_rcnn_models.sh counterpart).
#
# This build environment has NO network access, so this script only documents
# the expected layout; run it on a connected machine:
#
#   data/imagenet_weights/vgg16.pth   — torchvision vgg16 state_dict
#   data/imagenet_weights/res50.pth   — torchvision resnet50 state_dict
#   data/imagenet_weights/res101.pth  — torchvision resnet101 state_dict
#
# then convert for this framework:
#   python tools/convert_from_torch.py --net res101 \
#       --torch data/imagenet_weights/res101.pth \
#       --out data/jax_weights/res101
set -e
mkdir -p data/imagenet_weights
python - <<'EOF'
import torchvision, torch
for name, fn in [("vgg16", torchvision.models.vgg16),
                 ("res50", torchvision.models.resnet50),
                 ("res101", torchvision.models.resnet101)]:
    m = fn(weights="IMAGENET1K_V1")
    torch.save(m.state_dict(), f"data/imagenet_weights/{name}.pth")
    print("saved", name)
EOF
