#!/bin/bash
# Reference multi-scale + flip eval protocol (reference: test.sh:1-2).
python evaluate.py --dataset ade20k --data_path "${DATA:-datasets}" \
    --backbone clip_vitl16_384 \
    --weights "${CKPT:?set CKPT to a checkpoint}" \
    --bpe_vocab "${BPE:?set BPE to bpe_simple_vocab_16e6.txt.gz}"
