"""Training: losses, GT label generation, data-parallel trainer.

The reference documents its training recipe only through dead code
(utils/utils.py:1438-1762; no train.py exists, README TODO).  This package
ships a working trainer with those loss semantics.
"""

from pats_tpu.train.losses import (
    LevelLabels,
    matching_nll,
    position_loss,
    dustbin_losses,
    sampson_epipolar,
    transport_level_loss,
)
