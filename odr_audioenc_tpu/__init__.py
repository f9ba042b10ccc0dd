"""odr_audioenc_tpu: TPU-native batched DAB/DAB+ broadcast audio encoder."""

__version__ = "0.1.0"
