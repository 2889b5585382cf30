"""Zero-shot / few-shot transfer evaluation — CLI mirroring the
reference's test_lseg_zs.py (reference: test_lseg_zs.py:17-316):
1000-episode protocol on PASCAL-5i / COCO-20i / FSS-1000 with the
binary ['others', <class>] head, reporting mIoU and FB-IoU.

    python test_zs.py --dataset pascal --fold 0 --datapath datasets \
        --splits_dir /root/reference/fewshot_data/data/splits \
        --weights ckpt.ckpt --bpe_vocab bpe_simple_vocab_16e6.txt.gz \
        --backbone clip_resnet101
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser("lseg_tpu zero-shot eval")
    p.add_argument("--dataset", default="pascal",
                   choices=["pascal", "coco", "fss"])
    p.add_argument("--datapath", default="datasets")
    p.add_argument("--splits_dir",
                   default="/root/reference/fewshot_data/data/splits")
    p.add_argument("--label_dir", default=None,
                   help="reference-format label_files dir (default: packaged lists)")
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--nshot", type=int, default=0)
    p.add_argument("--backbone", default="clip_resnet101")
    p.add_argument("--weights", required=True)
    p.add_argument("--bpe_vocab", required=True)
    p.add_argument("--img_size", type=int, default=480)
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--arch_option", type=int, default=0)
    p.add_argument("--block_depth", type=int, default=0)
    p.add_argument("--activation", default="lrelu")
    p.add_argument("--logpath", default="logs/fewshot")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--visualize", action="store_true",
                   help="save support/pred/gt composites per episode "
                        "to --vis_path (reference "
                        "fewshot_data/common/vis.py)")
    p.add_argument("--vis_path", default="vis")
    return p.parse_args()


def main():
    args = parse_args()
    from lseg_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # make JAX_PLATFORMS=cpu invocations real
    from lseg_tpu.config import get_config
    from lseg_tpu.data.fewshot import build_fewshot_dataset
    from lseg_tpu.data.labels import get_labels
    from lseg_tpu.engine.episodic import (
        EpisodicEvaluator, make_episodic_predictor,
    )
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.text.cache import TextFeatureCache
    from lseg_tpu.text.tokenizer import ClipBPETokenizer
    from lseg_tpu.utils.checkpoint_convert import load_reference_checkpoint

    cfg = get_config(
        args.backbone, arch_option=args.arch_option,
        block_depth=args.block_depth, activation=args.activation,
    )
    model = LSegNet(cfg, dtype=jnp.bfloat16)
    variables, text_vars = load_reference_checkpoint(args.weights, cfg)

    labels = get_labels(args.dataset, args.label_dir)
    tok = ClipBPETokenizer.from_file(args.bpe_vocab)
    cache = TextFeatureCache(cfg.text, text_vars, tok)

    # RN101 uses ImageNet norm (reference: dataset.py:19-26,
    # test_lseg_zs.py:266-270)
    imagenet_norm = "resnet" in args.backbone
    ds = build_fewshot_dataset(
        args.dataset, args.datapath, args.fold, "test", args.nshot,
        splits_dir=args.splits_dir, img_size=args.img_size,
        imagenet_norm=imagenet_norm, seed=args.seed,
    )

    def pair_features(class_id: int):
        return cache.pair_features(labels[class_id])

    predictor = make_episodic_predictor(model, variables)
    vis = None
    if args.visualize:
        from lseg_tpu.utils.fewshot_vis import EpisodeVisualizer

        stats = (((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
                 if imagenet_norm else ((0.5,) * 3, (0.5,) * 3))
        vis = EpisodeVisualizer(args.vis_path, mean=stats[0],
                                std=stats[1])
    evaluator = EpisodicEvaluator(predictor, ds.class_ids,
                                  visualizer=vis)
    miou, fb_iou = evaluator.run(ds, pair_features, batch_size=args.bsz)

    os.makedirs(args.logpath, exist_ok=True)
    line = (f"dataset={args.dataset} fold={args.fold} nshot={args.nshot} "
            f"backbone={args.backbone} mIoU={miou:.2f} FB-IoU={fb_iou:.2f}")
    print(line)
    with open(os.path.join(
        args.logpath,
        f"log_fewshot-test_{args.dataset}_fold{args.fold}.txt",
    ), "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
