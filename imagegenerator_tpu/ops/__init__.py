"""Core neural-net ops: torch-semantics convs on NHWC, norms, inits, blocks."""

from imagegenerator_tpu.ops.conv import conv2d, conv_transpose2d
from imagegenerator_tpu.ops.layers import (
    Conv2d,
    ConvTranspose2d,
    Dense,
    BatchNorm,
    UpBlock,
    DownBlock,
)
from imagegenerator_tpu.ops.dropout import BitsDropout, bits_dropout
from imagegenerator_tpu.ops.gelu import gelu_exact_output_bwd
from imagegenerator_tpu.ops.grad_utils import replace_grad, clamp_with_grad
from imagegenerator_tpu.ops.quantize import vector_quantize

__all__ = [
    "conv2d",
    "conv_transpose2d",
    "Conv2d",
    "ConvTranspose2d",
    "Dense",
    "BatchNorm",
    "UpBlock",
    "DownBlock",
    "BitsDropout",
    "bits_dropout",
    "gelu_exact_output_bwd",
    "replace_grad",
    "clamp_with_grad",
    "vector_quantize",
]
