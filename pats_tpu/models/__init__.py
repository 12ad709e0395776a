"""flax.linen network modules of the PATS-TPU cascade."""

from pats_tpu.models.gnn import (
    MLPStack,
    KeypointEncoder,
    MultiHeadAttention,
    AttentionalPropagation,
    AttentionalGNN,
)
from pats_tpu.models.backbone import BasicBlock, CoarseTrunk, FineTrunk
from pats_tpu.models.coarse import CoarseMatcher
from pats_tpu.models.fine import FineMatcher
from pats_tpu.models.refine import SubpixelRefiner
from pats_tpu.models.cascade import PATSCascade
