"""Sharded batched genotyping step.

The genotyping workload is a grid of independent HMM runs over
(path-subset s, work-item b) — work items are chromosome blocks padded
to common (N columns, P paths, K kmers, A alleles). Per variant the raw
(unnormalized) allele-pair likelihoods of all subsets are SUMMED before
the final normalization (reference src/commands.cpp:155-185, 980-988);
under a (subset, batch) mesh that merge is a ``psum`` over the subset
axis riding ICI, replacing the reference's result mutex.

Layout:
  inputs  ColumnArrays with leading dims [S, B, ...] sharded
          P('subset', 'batch') — every device holds S/s_mesh × B/b_mesh
          HMM problem instances in HBM,
  compute vmapped forward-backward scans (per-device batch),
  output  [S?, B, N, A, A] posteriors; combined over 'subset' via psum,
          replicated on the subset axis, sharded over 'batch'.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..hmm.batch import forward_backward_batch
from ..hmm.forward_backward import ColumnArrays


def _fb_batch(columns: ColumnArrays):
    """Batched forward_backward over one leading batch dim (fused
    Pallas TPU kernel when eligible, vmapped XLA scan otherwise)."""
    return forward_backward_batch(columns)


def sharded_forward_backward(mesh: Mesh, columns: ColumnArrays):
    """Run the [S, B] grid of forward-backward problems on the mesh.

    Args:
      mesh: a Mesh with ('subset', 'batch') axes.
      columns: ColumnArrays whose leaves have leading dims [S, B, ...];
        S and B must be divisible by the mesh axis sizes.

    Returns:
      posteriors [B, N, A, A]: per-work-item allele-pair likelihood
        grids (emission-rescaled), summed over path subsets,
      log_correction [B, N]: per-column log factors restoring the
        reference's raw likelihood scale (see forward_backward).
    """
    in_spec = jax.tree.map(lambda _: P("subset", "batch"), columns)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(in_spec,),
        out_specs=(P("batch"), P("batch")),
        check_vma=False,
    )
    def step(cols: ColumnArrays):
        # local block [S_loc, B_loc, ...]: flatten, vmap, unflatten
        s_loc, b_loc = cols.alleles.shape[:2]
        flat = jax.tree.map(
            lambda x: x.reshape((s_loc * b_loc,) + x.shape[2:]), cols
        )
        posts, corr = _fb_batch(flat)  # [S*B, N, A, A], [S*B, N]
        posts = posts.reshape((s_loc, b_loc) + posts.shape[1:])
        corr = corr.reshape((s_loc, b_loc) + corr.shape[1:])
        # the log-correction is subset-independent (scale depends only
        # on the column's kmer probabilities), so summing SCALED raw
        # posteriors across subsets is exact; host code applies
        # exp(corr) once after gathering
        local = jnp.sum(posts, axis=0)  # combine local subsets
        return jax.lax.psum(local, "subset"), corr[0]

    return step(columns)


def shard_columns(mesh: Mesh, columns: ColumnArrays) -> ColumnArrays:
    """Place [S, B, ...] column arrays onto the mesh."""
    sharding = NamedSharding(mesh, P("subset", "batch"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), columns)
