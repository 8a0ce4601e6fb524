"""Sharded genotyping step on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangenie_tpu.hmm.forward_backward import forward_backward
from pangenie_tpu.parallel.genotyping import (
    shard_columns,
    sharded_forward_backward,
)
from pangenie_tpu.parallel.mesh import make_mesh
from pangenie_tpu.utils.synthetic import synthetic_columns


def _to_device(columns):
    return type(columns)(*[jnp.asarray(x) for x in columns])


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_equals_sequential():
    S, B = 2, 4
    columns = synthetic_columns(
        n_columns=16, n_paths=4, n_kmers=4, batch_dims=(S, B), seed=3
    )
    mesh = make_mesh(8, shape=(2, 4))
    device_cols = shard_columns(mesh, _to_device(columns))
    sharded, corr = sharded_forward_backward(mesh, device_cols)
    sharded = np.asarray(sharded)

    # sequential reference: per (s, b) forward_backward, summed over s
    expected = np.zeros_like(sharded)
    expected_corr = None
    for s in range(S):
        for b in range(B):
            cols_sb = type(columns)(
                *[jnp.asarray(x[s, b]) for x in columns]
            )
            posts_sb, corr_sb = forward_backward(cols_sb)
            expected[b] += np.asarray(posts_sb)
            if s == 0 and b == 0:
                expected_corr = np.asarray(corr_sb)
    np.testing.assert_allclose(sharded, expected, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(corr)[0], expected_corr)


def test_single_device_mesh():
    columns = synthetic_columns(
        n_columns=8, n_paths=4, n_kmers=4, batch_dims=(1, 1), seed=5
    )
    mesh = make_mesh(1)
    device_cols = shard_columns(mesh, _to_device(columns))
    out, _ = sharded_forward_backward(mesh, device_cols)
    out = np.asarray(out)
    assert out.shape[0] == 1
    assert np.all(np.isfinite(out))


def test_mesh_factorization():
    assert make_mesh(8, shape=(2, 4)).devices.shape == (2, 4)
    m = make_mesh(8)
    assert m.devices.shape[0] * m.devices.shape[1] == 8
    assert m.axis_names == ("subset", "batch")
