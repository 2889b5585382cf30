from lseg_tpu.utils.logging import Logger  # noqa: F401
from lseg_tpu.utils.palette import class_palette, colorize, overlay  # noqa: F401
from lseg_tpu.utils.seed import fix_randseed  # noqa: F401
