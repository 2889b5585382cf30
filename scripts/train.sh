#!/bin/bash
# Reference ADE20K recipe (reference: train.sh:5-6) on lseg_tpu.
python train.py --dataset ade20k --data_path "${DATA:-datasets}" \
    --exp_name lseg_ade20k_l16 \
    --base_lr 0.004 --weight_decay 1e-4 --max_epochs 240 \
    --batch_size "${BATCH:-16}" --accumulate_grad_batches "${ACCUM:-1}" \
    --backbone clip_vitl16_384 --widehead --no-scaleinv \
    --ckpt "${CKPT:?set CKPT to a reference checkpoint}" \
    --bpe_vocab "${BPE:?set BPE to bpe_simple_vocab_16e6.txt.gz}"
