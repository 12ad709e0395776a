"""Pallas TPU kernels for the hot ops."""

from pats_tpu.ops.pallas.sinkhorn_kernel import fused_log_sinkhorn
