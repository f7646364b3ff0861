#!/bin/bash
# Download the released pretrained model zoos of the reference
# (facebookresearch/hanabi_SAD models/download.sh) — the SAD, Other-Play and
# OBL .pthw checkpoints evaluated in BASELINE.md. This framework loads them
# directly (hanabi_sad_tpu/tools/loaders.py: load_sad_model / load_op_model /
# load_obl_model infer architectures from the tensors). Requires network
# access (not available in the build sandbox).
set -e

# obl models
wget https://dl.fbaipublicfiles.com/hanabi_op/all_obl_models.zip
unzip all_obl_models.zip

wget https://dl.fbaipublicfiles.com/hanabi_op/obl.zip
unzip obl.zip

# op models
wget https://dl.fbaipublicfiles.com/hanabi_op/op.zip
unzip op.zip

# sad models
wget https://dl.fbaipublicfiles.com/hanabi_sad/models.zip
unzip models.zip
mv models sad_models
