"""Analytic matmul/conv FLOP accounting from the jaxpr.

``jax.stages.Lowered.cost_analysis()`` returns ``None`` on some TPU
runtimes (the round-3 bench artifact lost its MFU field to exactly
that), so this module derives the MXU FLOP count directly from the
traced program: every ``dot_general`` and ``conv_general_dilated``
contributes ``2 * M * N * K`` (multiply-accumulate = 2 FLOPs), with
``scan`` bodies multiplied by their trip count.  Static shapes make the
count exact — the same property the whole fixed-capacity design relies
on (SURVEY.md par.7).

This intentionally counts ONLY MXU work (matmuls + convs): the MFU
numerator against a bf16 matmul peak.  VPU work (Sinkhorn's logsumexp
iterations, expansion gathers, normalizations) is real time but not
matmul FLOPs; ``while_loop`` bodies are counted once (the only whiles in
the model — Sinkhorn early-exit — contain no matmuls).

Cross-checked against XLA's own ``cost_analysis`` on CPU in
tests/test_flops.py.
"""

from __future__ import annotations

import math

import jax
import numpy as np


def _dot_flops(eqn) -> float:
    """2*M*N*K for a dot_general, from dimension_numbers + operand shapes."""
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = math.prod(lhs.shape[d] for d in lb)
    k = math.prod(lhs.shape[d] for d in lc)
    m = math.prod(lhs.shape[d] for d in range(len(lhs.shape))
                  if d not in set(lc) | set(lb))
    n = math.prod(rhs.shape[d] for d in range(len(rhs.shape))
                  if d not in set(rc) | set(rb))
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    """2 * out_elements * (K_spatial * C_in / groups) for a conv."""
    rhs = eqn.invars[1].aval                     # kernel
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    groups = (eqn.params.get("feature_group_count", 1)
              * eqn.params.get("batch_group_count", 1))
    k_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    c_in = rhs.shape[dn.rhs_spec[1]]             # per-group input channels
    out_elems = math.prod(out.shape)
    return 2.0 * out_elems * k_spatial * c_in / max(groups, 1)


def _walk(jaxpr, mult: float) -> float:
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += mult * _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += mult * _conv_flops(eqn)
        elif name == "scan":
            total += _walk(eqn.params["jaxpr"].jaxpr,
                           mult * eqn.params["length"])
        elif name == "while":
            # early-exit loops: count one iteration (no matmuls inside
            # the model's whiles; a different model should prefer scan)
            total += _walk(eqn.params["body_jaxpr"].jaxpr, mult)
        elif name == "cond":
            total += max((_walk(b.jaxpr, mult)
                          for b in eqn.params["branches"]), default=0.0)
        elif "jaxpr" in eqn.params:              # pjit/remat/custom_* calls
            inner = eqn.params["jaxpr"]
            total += _walk(getattr(inner, "jaxpr", inner), mult)
        elif "call_jaxpr" in eqn.params:
            inner = eqn.params["call_jaxpr"]
            total += _walk(getattr(inner, "jaxpr", inner), mult)
    return total


def matmul_flops(fn, *args) -> float:
    """Total dot/conv FLOPs of one call of ``fn(*args)``.

    Abstract avatars are enough — pass ShapeDtypeStructs to avoid
    materializing inputs."""
    avatars = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), args)
    jaxpr = jax.make_jaxpr(fn)(*avatars)
    return _walk(jaxpr.jaxpr, 1.0)
