"""Layer libraries: SV (scalar/vector) blocks, VN (vector-neuron) baselines,
binarized linear/conv primitives."""

from svnet_tpu.nn.sv_layers import (
    EPS,
    ste_sign,
    binarize,
    Linear,
    VectorBN,
    Vector2Scalar,
    VectorReLU,
    SVBlock,
    SVFuse,
    SV_STNkd,
    BatchNorm,
)

__all__ = [
    "EPS",
    "ste_sign",
    "binarize",
    "Linear",
    "VectorBN",
    "Vector2Scalar",
    "VectorReLU",
    "SVBlock",
    "SVFuse",
    "SV_STNkd",
    "BatchNorm",
]
