from .codec_runtime import Bitstream, CodecRuntime
from .flow import MESpynet
from .image_codec import ConditionalCodec, ImageCodec
from .pframe import PFrameCodec, bpp_from_likelihoods, init_pframe_variables
from .pframe_runtime import PFrameRuntime
from .resnet import ResNetTeacher
from .semantic import SemanticFeatureCodec, StudentBackbone, SupportAggregation

__all__ = [
    "Bitstream",
    "CodecRuntime",
    "ConditionalCodec",
    "ImageCodec",
    "MESpynet",
    "PFrameCodec",
    "PFrameRuntime",
    "bpp_from_likelihoods",
    "init_pframe_variables",
    "ResNetTeacher",
    "SemanticFeatureCodec",
    "StudentBackbone",
    "SupportAggregation",
]
