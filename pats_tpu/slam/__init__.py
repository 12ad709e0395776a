"""TPU-native geometry back-end (new capability beyond the reference).

The reference stops at pairwise matching + OpenCV RANSAC on the host
(evaluate.py).  This package adds the engine back-end the north star asks
for: batched on-device robust two-view geometry, a keyframe graph,
Gauss-Newton bundle adjustment with a psum-reduced Schur complement, and
trajectory evaluation (ATE).
"""

from pats_tpu.slam.geometry import (
    essential_from_matches,
    decompose_essential,
    triangulate,
    sampson_distance,
)
from pats_tpu.slam.ate import align_umeyama, absolute_trajectory_error
