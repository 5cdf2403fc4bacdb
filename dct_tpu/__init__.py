"""dct_tpu — a TPU-native block-transform image codec framework.

A ground-up JAX/XLA/Pallas re-design of the pipeline specified by the C
reference ``erkinov-wtf/dct`` (adaptive-DCT JPEG-style compressor):
level-shift -> 2D DCT-II -> (adaptive) quantization -> zigzag -> RLE ->
Huffman -> real serialized bitstream (which the reference lacks) -> decode
mirror. See SURVEY.md for the structural analysis and ARCHITECTURE.md for
how each reference component maps onto this package.
"""

from dct_tpu.config import CodecConfig, DEFAULT_CONFIG
from dct_tpu import tables

__version__ = "0.1.0"

__all__ = ["CodecConfig", "DEFAULT_CONFIG", "tables", "__version__"]
