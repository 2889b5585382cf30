from lseg_tpu.text.tokenizer import ClipBPETokenizer, tokenize  # noqa: F401
from lseg_tpu.text.cache import TextFeatureCache  # noqa: F401
