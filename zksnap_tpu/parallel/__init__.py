from .sharded import sharded_msm
