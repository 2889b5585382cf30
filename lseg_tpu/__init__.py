"""lseg_tpu — a TPU-native, JAX/XLA/Pallas framework for language-driven
(open-vocabulary) semantic segmentation.

Re-designed from scratch with the capabilities of isl-org/lang-seg (LSeg,
ICLR 2022): a DPT-style dense ViT image encoder produces per-pixel
embeddings, a CLIP text encoder embeds arbitrary label lists, and per-pixel
class logits are the temperature-scaled cosine similarity between them
(reference: modules/models/lseg_net.py:160-205).

Everything is pure-functional, jit-staged, and laid out NHWC/bf16 for the
TPU MXU. See SURVEY.md for the reference analysis and build plan.
"""

__version__ = "0.1.0"

from lseg_tpu.config import LSegConfig, BACKBONES, get_config  # noqa: F401
