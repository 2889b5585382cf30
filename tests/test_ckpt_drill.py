"""Real-checkpoint readiness drill (VERDICT r3 item 4).

The flagship parity flow — a reference-format Lightning `.ckpt` FILE
(zip-pickle, `net.*` key names), the CLIP BPE vocab file, and a
cat1.jpeg-style image — cannot run on the true artifacts in this
environment (no network egress). This drill builds SYNTHETIC versions
of all three (`lseg_tpu.testing.write_reference_ckpt` /
`write_reference_vocab`, backbone `tiny_vit_test`) and exercises the
exact code the real run will use, end to end:

1. file -> `load_reference_checkpoint` -> converted trees;
2. the torch whole-model oracle (literal reference semantics,
   tests/test_whole_model_oracle.py) produces the "reference-side"
   logits from the same file, through the same tokenizer + text tower;
3. `parity_check.py` runs as a SUBPROCESS on the dumped
   ref_input/ref_logits and must report PARITY: PASS;
4. `demo.py` runs as a subprocess on the ckpt + vocab + jpeg through
   the lseg_app preprocessing path and must save an overlay.

The first run with the user-supplied demo_e200.ckpt should exercise
zero new code. Reference: lseg_app.py:267-298, lseg_net.py:81-92.
"""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from lseg_tpu.config import get_config
from lseg_tpu.testing import write_reference_ckpt, write_reference_vocab

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LABELS = "plant,grass,cat,stone,other"


@pytest.fixture(scope="module")
def drill_artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("drill")
    cfg = get_config("tiny_vit_test")
    ckpt = tmp / "demo_tiny.ckpt"
    vocab = tmp / "bpe_tiny.txt.gz"
    write_reference_ckpt(str(ckpt), cfg, seed=3)
    write_reference_vocab(str(vocab))

    from PIL import Image

    rng = np.random.RandomState(0)
    img = (rng.rand(96, 128, 3) * 255).astype(np.uint8)
    jpeg = tmp / "cat_tiny.jpeg"
    Image.fromarray(img).save(jpeg, quality=95)
    return cfg, ckpt, vocab, jpeg, tmp


def test_parity_check_subprocess_passes(drill_artifacts):
    cfg, ckpt, vocab, jpeg, tmp = drill_artifacts
    from PIL import Image

    from lseg_tpu.data.transforms import normalize
    from lseg_tpu.text.cache import TextFeatureCache
    from lseg_tpu.text.tokenizer import ClipBPETokenizer
    from lseg_tpu.utils.checkpoint_convert import (
        extract_state_dict,
        load_torch_file,
    )
    from tests.test_whole_model_oracle import _oracle_forward

    labels = LABELS.split(",")
    # cat1.jpeg-style preprocessing (the notebook path: uint8 ->
    # normalize(0.5, 0.5)); size kept a multiple of 32
    pil = Image.open(jpeg).convert("RGB")
    x_nhwc = normalize(np.asarray(pil, np.uint8)).astype(np.float32)
    ref_input = x_nhwc.transpose(2, 0, 1)[None]       # NCHW, as dumped

    # reference-side logits via the torch oracle on the SAME file,
    # with text features from the converted tower + file tokenizer
    sd_np = extract_state_dict(load_torch_file(str(ckpt)))
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in sd_np.items()}
    from lseg_tpu.utils.checkpoint_convert import convert_clip_text

    tok = ClipBPETokenizer.from_file(str(vocab))
    txt = TextFeatureCache(cfg.text, convert_clip_text(sd_np), tok)(
        tuple(labels))
    with torch.no_grad():
        _, ref_logits = _oracle_forward(
            sd, cfg, torch.from_numpy(ref_input),
            torch.from_numpy(np.asarray(txt)))
    np.save(tmp / "ref_input.npy", ref_input)
    np.save(tmp / "ref_logits.npy", ref_logits.numpy())

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "parity_check.py"),
         "--weights", str(ckpt), "--bpe_vocab", str(vocab),
         "--ref_input", str(tmp / "ref_input.npy"),
         "--ref_logits", str(tmp / "ref_logits.npy"),
         "--labels", LABELS, "--backbone", "tiny_vit_test"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PARITY: PASS" in out.stdout, (out.stdout, out.stderr[-800:])


def test_demo_subprocess_on_reference_ckpt(drill_artifacts):
    cfg, ckpt, vocab, jpeg, tmp = drill_artifacts
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out_png = tmp / "overlay.png"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "demo.py"),
         "--image", str(jpeg), "--labels", LABELS,
         "--weights", str(ckpt), "--bpe_vocab", str(vocab),
         "--backbone", "tiny_vit_test", "--out", str(out_png)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "saved" in out.stdout and out_png.exists()
