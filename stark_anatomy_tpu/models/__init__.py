"""Model family: Rescue-Prime permutation and trace AIRs."""
