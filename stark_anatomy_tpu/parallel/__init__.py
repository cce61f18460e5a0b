"""Multi-device scale-out: mesh, sharded NTT/Merkle, multi-host init."""

from stark_anatomy_tpu.parallel import distributed  # noqa: F401
from stark_anatomy_tpu.parallel.mesh import (  # noqa: F401
    SHARD_AXIS,
    codeword_sharding,
    make_mesh,
    replicated,
)
from stark_anatomy_tpu.parallel.merkle_sharded import commit_sharded  # noqa: F401
from stark_anatomy_tpu.parallel.ntt_sharded import (  # noqa: F401
    sharded_coset_evaluate,
    sharded_ntt,
)
