"""IOP layer: Merkle commitments, Fiat-Shamir transcript, FRI, STARK."""
