"""Golden-parity harness vs the reference implementation.

BASELINE.json requires bit-comparable logits on the reference's
inputs/cat1.jpeg demo. This environment has no reference checkpoint /
CLIP vocab / image, so this script is the ready-to-run harness for when
the artifacts exist:

1. On the reference side (GPU box), dump the demo logits:
       out = lseg_model.net(image_tensor)           # (1, K, H, W)
       np.save("ref_logits.npy", out.cpu().numpy())
   and the exact normalized input:
       np.save("ref_input.npy", image_tensor.cpu().numpy())

2. Here:
       python parity_check.py --weights demo_e200.ckpt \
           --bpe_vocab bpe_simple_vocab_16e6.txt.gz \
           --ref_input ref_input.npy --ref_logits ref_logits.npy \
           --labels "plant,grass,cat,stone,other"

Reports max / mean absolute logit difference and argmax agreement.
Runs the model in fp32 with `emulate_fp16` correlation (the reference's
half-cast matmul quirk, modules/models/lseg_net.py:194) for the closest
numerics.
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args():
    p = argparse.ArgumentParser("lseg_tpu parity check")
    p.add_argument("--weights", required=True)
    p.add_argument("--bpe_vocab", required=True)
    p.add_argument("--ref_input", required=True,
                   help="(1,3,H,W) or (1,H,W,3) normalized fp32 .npy")
    p.add_argument("--ref_logits", required=True,
                   help="(1,K,H,W) reference logits .npy")
    p.add_argument("--labels", required=True)
    p.add_argument("--backbone", default="clip_vitl16_384")
    return p.parse_args()


def main():
    args = parse_args()
    from lseg_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # make JAX_PLATFORMS=cpu invocations real
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    from lseg_tpu.config import get_config
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.text.cache import TextFeatureCache
    from lseg_tpu.text.tokenizer import ClipBPETokenizer
    from lseg_tpu.utils.checkpoint_convert import load_reference_checkpoint

    labels = [s.strip() for s in args.labels.split(",") if s.strip()]
    cfg = get_config(args.backbone)
    # fp32 + fp16-emulated correlation for closest reference numerics
    model = LSegNet(cfg, dtype=jnp.float32, emulate_fp16=True)
    variables, text_vars = load_reference_checkpoint(args.weights, cfg)
    tok = ClipBPETokenizer.from_file(args.bpe_vocab)
    txt = TextFeatureCache(cfg.text, text_vars, tok)(tuple(labels))

    x = np.load(args.ref_input)
    if x.shape[1] == 3:  # NCHW -> NHWC
        x = x.transpose(0, 2, 3, 1)
    ref = np.load(args.ref_logits)
    if ref.shape[1] == len(labels):  # NKHW -> NHWK
        ref = ref.transpose(0, 2, 3, 1)

    out = np.asarray(model.apply(variables, jnp.asarray(x), txt))
    diff = np.abs(out - ref)
    agree = (out.argmax(-1) == ref.argmax(-1)).mean()
    print(f"logit max abs diff : {diff.max():.6f}")
    print(f"logit mean abs diff: {diff.mean():.6f}")
    print(f"argmax agreement   : {agree:.6f}")
    if diff.max() < 5e-2 and agree > 0.999:
        print("PARITY: PASS")
    else:
        print("PARITY: INSPECT (see per-layer debugging in "
              "utils/checkpoint_convert.py docstrings)")


if __name__ == "__main__":
    main()
