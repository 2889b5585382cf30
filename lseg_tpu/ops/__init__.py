from lseg_tpu.ops.resize import resize_bilinear, upsample2x  # noqa: F401
