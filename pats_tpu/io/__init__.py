"""Checkpoint I/O: orbax persistence + torch->jax weight conversion."""

from pats_tpu.io.convert import (
    convert_coarse,
    convert_fine,
    convert_refine,
    load_reference_checkpoints,
)
