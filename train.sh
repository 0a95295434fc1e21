#!/usr/bin/env bash
# Launcher mirroring the reference train.sh:1-2 (CUDA_VISIBLE_DEVICES there;
# device selection on TPU is the mesh — all visible chips are used).
python -m wavthruvec_pytorch_tpu.cli train-text2vec "$@"
# python -m wavthruvec_pytorch_tpu.cli train-vec2wav "$@"
