"""Batched forward-backward dispatch.

Single entry point for running a [B, N, ...] batch of independent
forward-backward problems on one device; the production genotyping
path, the bench, and the sharded multi-chip step all go through here so
backend-specific fast paths (the fused Pallas TPU kernel) stay in one
place with the portable XLA scan as fallback.
"""

from __future__ import annotations

import jax

from .forward_backward import ColumnArrays, forward_backward


def forward_backward_batch(columns: ColumnArrays):
    """Run B independent forward-backward scans.

    Args:
      columns: ColumnArrays with leading dims [B, N, ...].

    Returns:
      (posteriors [B, N, A, A], log_correction [B, N]) — see
      :func:`forward_backward`.
    """
    return jax.vmap(forward_backward)(columns)
