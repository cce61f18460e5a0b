"""IOP layer: Merkle commitments, Fiat-Shamir transcript, FRI, STARK."""

from stark_anatomy_tpu.iop.merkle import MerkleTree, verify_path  # noqa: F401
from stark_anatomy_tpu.iop.proof_stream import (  # noqa: F401
    OutOfBoundsReadIndexError,
    ProofStream,
    ProofStreamError,
)


def __getattr__(name):
    # Fri/Stark pull in the device stack; import lazily so transcript-only
    # users stay light.
    if name == "Fri":
        from stark_anatomy_tpu.iop.fri import Fri

        return Fri
    if name in ("Stark", "default_config"):
        from stark_anatomy_tpu.iop import stark as _stark

        return getattr(_stark, name)
    raise AttributeError(name)
