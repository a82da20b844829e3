from .fused import upsample8_argmax, upsample8_argmax_xla
