from .resize import (
    resize_bilinear,
    resize_nearest,
    downsample_half,
    scale_by,
)
from .conv import Conv, ConvNorm, ConvBnRelu, BatchNorm, conv_padding
from .primitives import (
    OP_CLASSES,
    make_op,
    FactorizedReduce,
    BasicResidual1x,
    BasicResidualDownup1x,
    BasicResidual2x,
    BasicResidualDownup2x,
)
from .seg_heads import FeatureFusion, Head, SELayer, AttentionRefinement
