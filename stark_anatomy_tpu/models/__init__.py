"""Traced computations ("model families") and their AIRs."""

from stark_anatomy_tpu.models.fibonacci import FibonacciAir  # noqa: F401
from stark_anatomy_tpu.models.mimc import MiMCAir, mimc  # noqa: F401
from stark_anatomy_tpu.models.rescue_prime import (  # noqa: F401
    RescuePrime,
    RescuePrimeAir,
)
