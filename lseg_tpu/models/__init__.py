from lseg_tpu.models.lseg import LSegNet  # noqa: F401
from lseg_tpu.models.vit import DenseViT  # noqa: F401
from lseg_tpu.models.resnet import ResNetBackbone  # noqa: F401
from lseg_tpu.models.clip_text import CLIPTextEncoder  # noqa: F401
from lseg_tpu.models.hsnet import HSNet  # noqa: F401
