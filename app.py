"""Interactive open-vocabulary segmentation app (Streamlit).

Equivalent of the reference's lseg_app.py: upload an image, type a
comma-separated label list, get the per-pixel segmentation overlay +
legend. Differences by design (SURVEY.md §3.4): text embeddings are
cached per label set (`TextFeatureCache`) so retyping labels never
re-runs the text tower, and the default path is the single-scale
Pallas-fused predictor (flip '--tta' in the sidebar for the full
multi-scale protocol).

    streamlit run app.py -- --weights demo_e200.ckpt \
        --bpe_vocab bpe_simple_vocab_16e6.txt.gz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np
from PIL import Image

try:
    import streamlit as st
except ImportError:  # pragma: no cover
    print("streamlit is not installed in this environment; use demo.py "
          "for the CLI demo", file=sys.stderr)
    sys.exit(1)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--weights", required=True)
    p.add_argument("--bpe_vocab", required=True)
    p.add_argument("--backbone", default="clip_vitl16_384")
    return p.parse_args()


@st.cache_resource
def load(weights: str, bpe_vocab: str, backbone: str):
    import jax.numpy as jnp

    from lseg_tpu.config import get_config
    from lseg_tpu.engine.serve import make_logits_fn, make_predictor
    from lseg_tpu.engine.tta import MultiScaleEvaluator
    from lseg_tpu.models.lseg import LSegNet
    from lseg_tpu.text.cache import TextFeatureCache
    from lseg_tpu.text.tokenizer import ClipBPETokenizer
    from lseg_tpu.utils.checkpoint_convert import load_reference_checkpoint

    cfg = get_config(backbone)
    model = LSegNet(cfg, dtype=jnp.bfloat16)
    variables, text_vars = load_reference_checkpoint(weights, cfg)
    tok = ClipBPETokenizer.from_file(bpe_vocab)
    cache = TextFeatureCache(cfg.text, text_vars, tok)
    return model, variables, cache, make_predictor(model, variables), \
        make_logits_fn(model, variables)


def main():
    args = parse_args()
    from lseg_tpu.utils.platform import apply_platform_env
    apply_platform_env()  # make JAX_PLATFORMS=cpu invocations real
    st.title("LSeg-TPU — language-driven segmentation")
    model, variables, cache, predictor, logits_fn = load(
        args.weights, args.bpe_vocab, args.backbone
    )

    uploaded = st.file_uploader("image", type=["jpg", "jpeg", "png"])
    label_str = st.text_input("labels (comma-separated)",
                              "dog, grass, other")
    use_tta = st.sidebar.checkbox("multi-scale + flip TTA", value=False)
    alpha = st.sidebar.slider("overlay alpha", 0.0, 1.0, 0.5)

    if uploaded is None or not label_str.strip():
        st.stop()

    import jax.numpy as jnp

    from lseg_tpu.data.transforms import normalize
    from lseg_tpu.engine.tta import MultiScaleEvaluator
    from lseg_tpu.utils.palette import (
        class_palette, legend_patches, overlay,
    )

    labels = [s.strip() for s in label_str.split(",") if s.strip()]
    txt = cache(tuple(labels))
    pil = Image.open(uploaded).convert("RGB")

    if use_tta:
        img = normalize(np.asarray(pil, np.uint8)).astype(np.float32)
        ev = MultiScaleEvaluator(logits_fn, num_classes=len(labels))
        pred = ev(img, txt)
        shown = np.asarray(pil, np.uint8)
    else:
        small = pil.resize((480, 360), Image.BILINEAR)
        img = normalize(np.asarray(small, np.uint8)).astype(np.float32)
        # decoder needs multiples of 32: pad 360 -> 384, crop back
        x = np.pad(img, ((12, 12), (0, 0), (0, 0)), constant_values=-1.0)
        pred = np.asarray(predictor(jnp.asarray(x[None]), txt))[0][12:-12]
        shown = np.asarray(small, np.uint8)

    pal = class_palette(len(labels))
    st.image(overlay(shown, pred, pal, alpha=alpha),
             caption="segmentation")
    for name, color in legend_patches(pred, labels, pal):
        st.markdown(
            f'<span style="color: rgb{color}">■</span> {name}',
            unsafe_allow_html=True,
        )


if __name__ == "__main__":
    main()
