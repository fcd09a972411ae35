from .native import (
    BN254_G1,
    SECP256K1,
    AffinePoint,
    CurveParams,
    bn254_generator,
    secp_generator,
)
