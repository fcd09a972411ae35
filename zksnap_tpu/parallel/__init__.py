from .distributed import (
    ProtocolMesh,
    chip_submesh,
    initialize,
    protocol_mesh,
    scaling_efficiency,
)
from .sharded import sharded_msm

__all__ = [
    "ProtocolMesh",
    "chip_submesh",
    "initialize",
    "protocol_mesh",
    "scaling_efficiency",
    "sharded_msm",
]
