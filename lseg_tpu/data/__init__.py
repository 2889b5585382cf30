from lseg_tpu.data.labels import get_labels  # noqa: F401
