"""GT pair-list parsing.

Format (reference data/*_test_pairs_with_gt.txt, SURVEY.md par.2.1):
``img0 img1 0 0 K0(9) K1(9) T_0to1(16)`` per line.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class PairRecord:
    name0: str
    name1: str
    K0: np.ndarray          # (3, 3)
    K1: np.ndarray          # (3, 3)
    T_0to1: np.ndarray      # (4, 4)


def parse_pair_line(line: str) -> PairRecord:
    parts = line.split()
    K0 = np.asarray(parts[4:13], dtype=float).reshape(3, 3)
    K1 = np.asarray(parts[13:22], dtype=float).reshape(3, 3)
    T = np.asarray(parts[22:], dtype=float)
    if T.size == 12:
        T = np.concatenate([T, [0, 0, 0, 1]])
    return PairRecord(parts[0], parts[1], K0, K1, T.reshape(4, 4))
