from .codec_runtime import Bitstream, CodecRuntime
from .image_codec import ConditionalCodec, ImageCodec

__all__ = ["Bitstream", "CodecRuntime", "ConditionalCodec", "ImageCodec"]
