"""Pure numeric kernels of the PATS-TPU framework.

Every op here is a pure function of jnp arrays with static shapes, jit- and
vmap-compatible, and unit-tested against slow oracles in tests/.
"""

from pats_tpu.ops.sinkhorn import (
    log_sinkhorn,
    ot_learned_dustbin,
    ot_inline_dustbin,
)
from pats_tpu.ops.expand import expand_transport
from pats_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_bilinear_half_pixel,
    crop_resize_batch,
    avg_pool_2x2_pad,
)
from pats_tpu.ops.extract import extract_patch_neighborhoods
from pats_tpu.ops.merge import merge_cells
from pats_tpu.ops.compose import compose_matches
