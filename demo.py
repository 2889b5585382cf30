"""Open-vocabulary segmentation demo — CLI equivalent of the reference's
lseg_demo.ipynb (segment an image with a free-text label list, save an
overlay; reference notebook uses inputs/cat1.jpeg with labels
'plant,grass,cat,stone,other').

    python demo.py --image cat1.jpeg --labels "plant,grass,cat,stone,other" \
        --weights demo_e200.ckpt --bpe_vocab bpe_simple_vocab_16e6.txt.gz \
        [--tta]  # multi-scale sliding-window + flip protocol

Without --tta the single-scale Pallas-fused predictor runs at the
resized [360, 480] app shape (reference: lseg_app.py:328-334).
"""

from __future__ import annotations

import argparse

import numpy as np
from PIL import Image


def parse_args():
    p = argparse.ArgumentParser("lseg_tpu demo")
    p.add_argument("--image", required=True)
    p.add_argument("--labels", required=True,
                   help="comma-separated label list")
    p.add_argument("--weights", required=True,
                   help="reference .ckpt, or 'random' for a smoke run "
                        "with random weights (no text tower)")
    p.add_argument("--bpe_vocab", default=None,
                   help="CLIP BPE vocab (required unless --weights random)")
    p.add_argument("--backbone", default="clip_vitl16_384")
    p.add_argument("--out", default="demo_out.png")
    p.add_argument("--tta", action="store_true")
    p.add_argument("--fast", action="store_true",
                   help="fast serving config (flash kernels + tanh "
                        "GELU + bf16 head; lseg_tpu.config.fast_serving)")
    p.add_argument("--int8", action="store_true",
                   help="with --fast: static int8 projections + "
                        "decoder convs")
    p.add_argument("--alpha", type=float, default=0.5)
    return p.parse_args()


def main():
    args = parse_args()
    from lseg_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # make JAX_PLATFORMS=cpu invocations real
    import jax.numpy as jnp

    from lseg_tpu.config import fast_serving, get_config
    from lseg_tpu.data.transforms import normalize
    from lseg_tpu.engine.serve import make_logits_fn, make_predictor
    from lseg_tpu.engine.tta import MultiScaleEvaluator
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.text.cache import TextFeatureCache
    from lseg_tpu.text.tokenizer import ClipBPETokenizer
    from lseg_tpu.utils.checkpoint_convert import load_reference_checkpoint
    from lseg_tpu.utils.palette import class_palette, legend_patches, overlay

    labels = [s.strip() for s in args.labels.split(",") if s.strip()]
    cfg = get_config(args.backbone)
    if args.fast:
        cfg = fast_serving(cfg, quant="static" if args.int8 else False)
    elif args.int8:
        raise SystemExit("--int8 requires --fast")
    model = LSegNet(cfg, dtype=jnp.bfloat16)
    if args.weights == "random":
        import jax

        print("SMOKE MODE: random weights + random label embeddings")
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 480, 480, 3)),
            jnp.zeros((len(labels), cfg.out_c)),
        )
        txt = jax.random.normal(
            jax.random.PRNGKey(1), (len(labels), cfg.out_c)
        )
    else:
        variables, text_vars = load_reference_checkpoint(args.weights, cfg)
        tok = ClipBPETokenizer.from_file(args.bpe_vocab)
        cache = TextFeatureCache(cfg.text, text_vars, tok)
        txt = cache(tuple(labels))
    if args.int8:
        from lseg_tpu.ops.quant import quantize_tree

        variables = dict(variables)
        variables["params"] = quantize_tree(variables["params"],
                                            decoder=True)

    pil = Image.open(args.image).convert("RGB")
    if args.tta:
        img = normalize(np.asarray(pil, np.uint8))
        ev = MultiScaleEvaluator(
            make_logits_fn(model, variables), num_classes=len(labels)
        )
        pred = ev(img.astype(np.float32), txt)
        shown = np.asarray(pil, np.uint8)
    else:
        # app preprocessing: Resize([360, 480]) (lseg_app.py:328-334);
        # the decoder needs multiples of 32 (the reference's DPT Resize
        # uses ensure_multiple_of=32), so pad 360 -> 384 and crop back
        small = pil.resize((480, 360), Image.BILINEAR)
        img = normalize(np.asarray(small, np.uint8)).astype(np.float32)
        x = np.pad(img, ((12, 12), (0, 0), (0, 0)), constant_values=-1.0)
        predictor = make_predictor(model, variables)
        pred = np.asarray(predictor(jnp.asarray(x[None]), txt))[0]
        pred = pred[12:-12]
        shown = np.asarray(small, np.uint8)

    pal = class_palette(len(labels))
    out = overlay(shown, pred, pal, alpha=args.alpha)
    Image.fromarray(out).save(args.out)
    print(f"saved {args.out}")
    for name, color in legend_patches(pred, labels, pal):
        print(f"  {name}: rgb{color}")


if __name__ == "__main__":
    main()
