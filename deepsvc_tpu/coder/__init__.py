from .rans import (
    BufferedRansEncoder,
    RansDecoder,
    decode_with_indexes,
    encode_with_indexes,
)

__all__ = [
    "BufferedRansEncoder",
    "RansDecoder",
    "encode_with_indexes",
    "decode_with_indexes",
]
