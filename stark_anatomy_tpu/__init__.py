"""stark_anatomy_tpu — a TPU-native STARK proving framework.

A from-scratch JAX / XLA / Pallas implementation of the full STARK stack
whose bottom layers are behaviorally (bit-exactly) compatible with the
Rust reference library `stark-anat` (greged93/stark-anatomy):

- ``ops.field``        — the 128-bit prime field F_p, p = 1 + 407*2^119
                         (reference: src/field/types/field.rs:15), host oracle
                         + extended Euclid (reference: src/field/utils.rs:3-18).
- ``ops.limbs`` /
  ``ops.field_jnp`` /
  ``ops.field_pallas`` — limb-decomposed device field arithmetic
                         (8 x 16-bit digits in uint32 lanes, Montgomery REDC).
- ``ops.ntt``          — radix-2 NTT / iNTT, coset LDE, polynomial multiply.
- ``ops.blake2b``      — vectorized Blake2b-512 on device (reference hash:
                         src/iop/types/merkle.rs:1).
- ``iop.merkle``       — Merkle commitment (reference: src/iop/types/merkle.rs).
- ``iop.proof_stream`` — Fiat-Shamir transcript, byte-compatible with the
                         reference's serde_json/SHA-256 scheme
                         (reference: src/iop/types/proof_stream.rs).
- ``iop.fri``          — FRI low-degree protocol (absent in reference; part of
                         the capability surface per BASELINE.json).
- ``iop.stark``        — STARK prover / verifier over an AIR.
- ``models``           — Rescue-Prime permutation + AIRs (the "model family").
- ``parallel``         — multi-device / multi-host sharded prover: four-step
                         NTT with all-to-all, sharded hashing, mesh utilities.
"""

__version__ = "0.1.0"

from stark_anatomy_tpu.ops.field import PRIME, FieldElement  # noqa: F401


def clear_table_caches() -> None:
    """Release every module-level twiddle/domain table cache.

    Cache policy: precomputed tables (NTT twiddles, Pallas stage tables,
    FRI inverse-domain tables, compiled sharded-NTT closures) are cached
    per distinct (size, direction) key for the life of the process —
    the right trade for a prover that hammers a handful of domain sizes.
    A long-lived service proving MANY distinct sizes should call this
    between size regimes to drop the accumulated host/device arrays
    (the hundreds-of-MB scale arrives only at 2^22+ domains; tables are
    rebuilt on demand in milliseconds-to-seconds).
    """
    from stark_anatomy_tpu.iop import fri as _fri
    from stark_anatomy_tpu.ops import ntt as _ntt
    from stark_anatomy_tpu.ops import ntt_pallas as _ntp
    from stark_anatomy_tpu.parallel import ntt_sharded as _nts

    _ntt._TWIDDLE_CACHE.clear()
    _ntp._STAGE_TABLES.clear()
    _nts._BUILT.clear()
    _fri._inv_domain_mont.cache_clear()
