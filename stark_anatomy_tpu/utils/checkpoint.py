"""Prover phase checkpoint/resume (SURVEY.md section 5.4).

The reference persists nothing but the final proof; at production trace
sizes the prover runs long enough that host/device loss mid-run matters.
The prover is deterministic given (trace, boundary, randomizer_seed), so a
checkpoint only needs the *expensive intermediates* at a phase boundary:

- stage "pre-fri": the Fiat-Shamir transcript so far, the combination
  codeword, and the boundary-quotient codewords (the Merkle tree is
  re-committed from them on resume — hashing is cheap next to the LDE and
  quotient arithmetic being skipped).

Format: one .npz (limb arrays) + one .json (transcript + shape metadata)
per stage. Resume validates the domain parameters and refuses mismatches.
Wired into Stark.prove(checkpoint_dir=...).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

STAGE_PRE_FRI = "pre-fri"


def _paths(directory: str, stage: str):
    return (
        os.path.join(directory, f"stark-{stage}.npz"),
        os.path.join(directory, f"stark-{stage}.json"),
    )


def save(directory: str, stage: str, items: list, arrays: Dict[str, np.ndarray],
         meta: Dict) -> None:
    """Atomically persist a phase checkpoint."""
    os.makedirs(directory, exist_ok=True)
    npz_path, json_path = _paths(directory, stage)
    tmp = npz_path + ".tmp.npz"
    np.savez(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
    os.replace(tmp, npz_path)
    tmp = json_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"stage": stage, "meta": meta, "items": items}, fh)
    os.replace(tmp, json_path)


def load(directory: str, stage: str, expect_meta: Dict) -> Optional[Dict]:
    """Load a checkpoint if present AND its metadata matches, else None."""
    npz_path, json_path = _paths(directory, stage)
    if not (os.path.exists(npz_path) and os.path.exists(json_path)):
        return None
    try:
        with open(json_path) as fh:
            doc = json.load(fh)
        if doc.get("stage") != stage or doc.get("meta") != expect_meta:
            return None
        arrays = dict(np.load(npz_path))
        return {"items": doc["items"], "arrays": arrays}
    except (OSError, ValueError, KeyError):
        return None


def clear(directory: str, stage: str) -> None:
    for p in _paths(directory, stage):
        try:
            os.remove(p)
        except OSError:
            pass
