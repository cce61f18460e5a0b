"""Fibonacci AIR: the minimal second model family.

Two registers (a, b) stepping (a, b) -> (b, a + b); linear (degree-1)
transition constraints and three boundary constraints (both seeds pinned
at row 0, the claimed value at the last row). Exists to demonstrate that
iop/stark.py is AIR-generic — nothing in the prover/verifier is
Rescue-Prime-specific — and exercises the linear-constraint degree
accounting (Stark.max_degree).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from stark_anatomy_tpu.ops import field_pallas as fp
from stark_anatomy_tpu.ops.field import PRIME


@dataclass(frozen=True)
class FibonacciAir:
    """AIR for `num_steps` Fibonacci steps (cycle_count rows = steps + 1)."""

    num_steps: int
    a0: int = 1
    b0: int = 1

    @property
    def num_registers(self) -> int:
        return 2

    @property
    def cycle_count(self) -> int:
        return self.num_steps + 1

    @property
    def constraint_degree(self) -> int:
        return 1

    @property
    def num_constraints(self) -> int:
        return 2

    def constant_columns(self, num_rows: int) -> List[List[int]]:
        return []

    def trace(self) -> np.ndarray:
        a, b = self.a0 % PRIME, self.b0 % PRIME
        rows = [[a, b]]
        for _ in range(self.num_steps):
            a, b = b, (a + b) % PRIME
            rows.append([a, b])
        return np.array(rows, dtype=object)

    def output(self) -> int:
        return int(self.trace()[-1][0])

    def boundary_constraints(self, output_element: int) -> List[tuple]:
        return [
            (0, 0, self.a0 % PRIME),
            (0, 1, self.b0 % PRIME),
            (self.cycle_count - 1, 0, output_element % PRIME),
        ]

    def eval_transition_device(
        self,
        cur: List[jnp.ndarray],
        nxt: List[jnp.ndarray],
        constants: List[jnp.ndarray],
    ) -> List[jnp.ndarray]:
        """[next_a - b, next_b - (a + b)] over the whole domain."""
        return [
            fp.sub(nxt[0], cur[1]),
            fp.sub(nxt[1], fp.add(cur[0], cur[1])),
        ]

    def eval_transition_host(
        self, cur: Sequence[int], nxt: Sequence[int], constants: Sequence[int]
    ) -> List[int]:
        return [
            (nxt[0] - cur[1]) % PRIME,
            (nxt[1] - cur[0] - cur[1]) % PRIME,
        ]
