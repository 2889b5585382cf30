"""ADE20K evaluation — CLI mirroring the reference's test_lseg.py /
test.sh (reference: test_lseg.py:37-216,432-436): single-scale or
multi-scale sliding-window + flip TTA over the val split, reporting
pixAcc / mIoU and per-class IoU to a log file.

    python evaluate.py --dataset ade20k --data_path datasets \
        --weights ckpt.ckpt --bpe_vocab bpe.gz [--no-tta] [--limit N]
"""

from __future__ import annotations

import argparse
import os
import time

import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser("lseg_tpu evaluator")
    p.add_argument("--dataset", default="ade20k",
                   choices=["ade20k", "citys", "pascal_voc",
                            "pascal_aug", "pcontext", "coco"])
    p.add_argument("--data_path", default="datasets")
    p.add_argument("--label_dir", default=None,
                   help="reference-format label_files dir (default: packaged lists)")
    p.add_argument("--weights", required=True)
    p.add_argument("--bpe_vocab", required=True)
    p.add_argument("--backbone", default="clip_vitl16_384")
    # base/crop/scales default per dataset (reference: lseg_module.py:29-34
    # base 520/crop 480, citys 2048/768; test_lseg.py:308-312 citys scales)
    p.add_argument("--base_size", type=int, default=None)
    p.add_argument("--crop_size", type=int, default=None)
    p.add_argument("--scales", type=float, nargs="+", default=None)
    p.add_argument("--no-tta", dest="no_tta", action="store_true",
                   help="single-scale 480 center protocol instead")
    p.add_argument("--no-flip", dest="no_flip", action="store_true")
    p.add_argument("--batch_size", type=int, default=8,
                   help="single-scale batch")
    p.add_argument("--limit", type=int, default=0,
                   help="evaluate only the first N images (0 = all)")
    p.add_argument("--logdir", default="logs")
    p.add_argument("--acc-bn", dest="acc_bn", action="store_true",
                   help="re-estimate BN running stats on train data "
                        "before eval (precise BN, the reference's "
                        "--acc-bn path)")
    p.add_argument("--acc_bn_batches", type=int, default=100)
    p.add_argument("--export", default=None,
                   help="write the loaded weights as a raw .npz and exit "
                        "(the reference's test_lseg.py --export path)")
    p.add_argument("--fast", action="store_true",
                   help="fast serving config (flat flash attention + "
                        "tanh GELU + bf16 head; see "
                        "lseg_tpu.config.fast_serving). Default is the "
                        "parity config.")
    p.add_argument("--int8-cal", dest="int8_cal", type=int, default=0,
                   metavar="N",
                   help="with --fast --int8: additionally calibrate "
                        "static activation scales on N val images "
                        "(static PTQ, the bench.py serving config; "
                        "removes the per-call max|x| passes). 0 = "
                        "dynamic activation scales (data-safe "
                        "default).")
    p.add_argument("--int8", action="store_true",
                   help="with --fast: static int8 projections + "
                        "decoder convs (load-time weight quantization "
                        "with dynamic per-tensor activation scales — "
                        "data-safe; bench.py additionally calibrates "
                        "static activation scales on its own input; "
                        "drift bounds in tests/test_quant.py)")
    p.add_argument("--arch_option", type=int, default=0)
    p.add_argument("--block_depth", type=int, default=0)
    p.add_argument("--activation", default="lrelu")
    return p.parse_args()


_STD_SCALES = (0.5, 0.75, 1.0, 1.25, 1.5, 1.75)
_DATASET_DEFAULTS = {
    # name -> (base_size, crop_size, scales)
    "ade20k": (520, 480, _STD_SCALES),
    "citys": (2048, 768, (0.75, 1.0, 1.25, 1.5, 1.75, 2.0, 2.25)),
    "pascal_voc": (520, 480, _STD_SCALES),
    "pascal_aug": (520, 480, _STD_SCALES),
    "pcontext": (520, 480, _STD_SCALES),
    "coco": (520, 480, _STD_SCALES),
}


def _make_dataset(name, data_path, split, mode, base_size, crop_size):
    if name == "citys":
        from lseg_tpu.data.cityscapes import CitySegmentation as DS
    elif name == "pascal_voc":
        from lseg_tpu.data.voc import VOCSegmentation as DS
    elif name == "pascal_aug":
        from lseg_tpu.data.voc import VOCAugSegmentation as DS
    elif name == "pcontext":
        from lseg_tpu.data.voc import PContextSegmentation as DS
    elif name == "coco":
        from lseg_tpu.data.coco import COCOSegmentation as DS
    else:
        from lseg_tpu.data.ade20k import ADE20KSegmentation as DS

    return DS(data_path, split, mode=mode,
              base_size=base_size, crop_size=crop_size)


def main():
    args = parse_args()
    from lseg_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # make JAX_PLATFORMS=cpu invocations real
    base_d, crop_d, scales_d = _DATASET_DEFAULTS[args.dataset]
    if args.base_size is None:
        args.base_size = base_d
    if args.crop_size is None:
        args.crop_size = crop_d
    if args.scales is None:
        args.scales = list(scales_d)
    from lseg_tpu.config import get_config
    from lseg_tpu.data.labels import get_labels
    from lseg_tpu.engine.eval_single import SingleScaleEvaluator
    from lseg_tpu.engine.serve import make_logits_fn
    from lseg_tpu.engine.tta import MultiScaleEvaluator, TTAProtocol
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.ops.metrics import SegmentationMetric
    from lseg_tpu.text.cache import TextFeatureCache
    from lseg_tpu.text.tokenizer import ClipBPETokenizer
    from lseg_tpu.utils.checkpoint_convert import load_reference_checkpoint

    cfg = get_config(
        args.backbone, arch_option=args.arch_option,
        block_depth=args.block_depth, activation=args.activation,
    )
    if args.int8_cal and not args.int8:
        raise SystemExit("--int8-cal requires --fast --int8")
    if args.fast:
        from lseg_tpu.config import fast_serving

        quant = False
        if args.int8:
            quant = "static_cal" if args.int8_cal else "static"
        cfg = fast_serving(cfg, quant=quant)
    elif args.int8:
        raise SystemExit("--int8 requires --fast")
    model = LSegNet(cfg, dtype=jnp.bfloat16)
    variables, text_vars = load_reference_checkpoint(args.weights, cfg)
    if args.int8:
        from lseg_tpu.ops.quant import quantize_tree

        variables = dict(variables)
        variables["params"] = quantize_tree(
            variables["params"], decoder=True,
            act_scale=bool(args.int8_cal))
    if args.int8_cal:
        # static PTQ: fill the act_scale params from N val images at
        # the crop shape (amaxes are shape-independent scalars)
        from lseg_tpu.ops.quant import calibrate_act_scales

        cal_ds = _make_dataset(
            args.dataset, args.data_path, "val", "val",
            args.base_size, args.crop_size,
        )
        m = min(args.int8_cal, len(cal_ds))
        imgs = jnp.asarray(np.stack(
            [cal_ds[j]["image"] for j in range(m)]))
        print(f"calibrating int8 activation scales on {m} val images")
        variables = calibrate_act_scales(model, variables, imgs, None)
    if args.export:
        from lseg_tpu.train.checkpoint import export_params

        class _S:
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})

        export_params(args.export, _S())
        print(f"exported {args.export}")
        return
    if args.acc_bn:
        from lseg_tpu.utils.precise_bn import update_bn_stats

        train_ds = _make_dataset(
            args.dataset, args.data_path, "train", "train",
            args.base_size, args.crop_size,
        )

        def bn_apply(v, batch):
            import jax

            _, mut = jax.jit(
                lambda v, x: model.apply(v, x, None, train=True,
                                         mutable=["batch_stats"])
            )(v, batch)
            return mut["batch_stats"]

        def batches():
            for i in range(0, len(train_ds), args.batch_size):
                yield jnp.asarray(np.stack([
                    train_ds[j]["image"]
                    for j in range(i, min(i + args.batch_size,
                                          len(train_ds)))
                ]))

        print("re-estimating BN statistics (precise BN)")
        variables = dict(variables)
        variables["batch_stats"] = update_bn_stats(
            bn_apply, variables, batches(),
            max_batches=args.acc_bn_batches,
        )
    # the 'coco' seg dataset paints the 21 VOC classes
    # (encoding COCOSegmentation CAT_LIST), not the 80 COCO-20i names
    label_set = "pascal_voc" if args.dataset == "coco" else args.dataset
    labels = get_labels(label_set, args.label_dir)
    tok = ClipBPETokenizer.from_file(args.bpe_vocab)
    txt = TextFeatureCache(cfg.text, text_vars, tok)(tuple(labels))

    metric = SegmentationMetric(len(labels), ignore_index=-1)
    logits_fn = make_logits_fn(model, variables)
    t0 = time.time()

    if args.no_tta:
        ds = _make_dataset(
            args.dataset, args.data_path, "val", "val",
            args.base_size, args.crop_size,
        )
        ev = SingleScaleEvaluator(
            logits_fn, len(labels), flip=not args.no_flip
        )
        n = min(len(ds), args.limit) if args.limit else len(ds)
        bs = args.batch_size
        # tail batch: pad by repeating the last image so every image is
        # evaluated (the reference evaluates all; pad rows' metrics are
        # masked out below with an all-ignore target)
        for i in range(0, n, bs):
            idx = list(range(i, min(i + bs, n)))
            pad = bs - len(idx)
            batch = [ds[j] for j in idx] + [ds[idx[-1]]] * pad
            imgs = jnp.asarray(np.stack([b["image"] for b in batch]))
            tgts = np.stack([b["target"] for b in batch])
            if pad:
                tgts[len(idx):] = -1  # ignore_index: zero metric weight
            c, l, it, u = ev.metrics(imgs, jnp.asarray(tgts), txt)
            metric.total_correct += float(c)
            metric.total_label += float(l)
            metric.total_inter += np.asarray(it, np.float64)
            metric.total_union += np.asarray(u, np.float64)
            if (i // bs) % 10 == 0:
                pa, miou = metric.get()
                print(f"[{i + bs}/{n}] pixAcc {pa:.4f} mIoU {miou:.4f}",
                      flush=True)
    else:
        ds = _make_dataset(args.dataset, args.data_path, "val", "testval",
                           args.base_size, args.crop_size)
        proto = TTAProtocol(
            base_size=args.base_size, crop_size=args.crop_size,
            scales=tuple(args.scales), flip=not args.no_flip,
        )
        ev = MultiScaleEvaluator(logits_fn, len(labels), proto)
        n = min(len(ds), args.limit) if args.limit else len(ds)
        for i in range(n):
            sample = ds[i]
            logits = ev(sample["image"], txt, return_logits=True)
            metric.update(jnp.asarray(logits)[None],
                          jnp.asarray(sample["target"])[None])
            if i % 10 == 0:
                pa, miou = metric.get()
                print(f"[{i + 1}/{n}] pixAcc {pa:.4f} mIoU {miou:.4f}",
                      flush=True)

    pix_acc, miou = metric.get()
    dt = time.time() - t0
    os.makedirs(args.logdir, exist_ok=True)
    mode = "single" if args.no_tta else "multi"
    with open(os.path.join(
        args.logdir, f"log_test_{args.dataset}_{mode}.txt"
    ), "a") as f:
        f.write(f"pixAcc: {pix_acc:.4f}, mIoU: {miou:.4f}, "
                f"images: {n}, seconds: {dt:.1f}\n")
        for i, iou in enumerate(metric.per_class_iou()):
            f.write(f"  {i:3d} {labels[i]}: {iou:.4f}\n")
    print(f"FINAL pixAcc {pix_acc:.4f} mIoU {miou:.4f} ({dt:.1f}s)")


if __name__ == "__main__":
    main()
