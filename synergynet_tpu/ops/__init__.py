"""Hand-written TPU kernels (Pallas) for the hot ops."""

from synergynet_tpu.ops.fused_decode import (  # noqa: F401
    decode_dense_fused, decode_dense_fast, build_decode_basis,
    get_decode_basis, DecodeBasis,
)
