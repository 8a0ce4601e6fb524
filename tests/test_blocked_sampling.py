"""Blocked min-plus Viterbi (hmm/sampling.py::_blocked_viterbi) must be
bit-identical — paths AND scores — to the reference-faithful column
scan (_viterbi_iteration), including tie-breaking, masking, and the
greedy mask/penalty feedback loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangenie_tpu.hmm.sampling import (
    _BLOCK_L,
    _blocked_viterbi_jit,
    _viterbi_iteration,
    _viterbi_iteration_auto,
)


def _compare(path_cost, mask, switch, L):
    """Run both formulations on one [C, N, P] instance."""
    pc = jnp.asarray(path_cost)
    mk = jnp.asarray(mask)
    sw = jnp.asarray(switch)
    got_p, got_s = _blocked_viterbi_jit(pc, mk, sw, L=L)
    want_p = []
    want_s = []
    for c in range(pc.shape[0]):
        p, s = _viterbi_iteration(pc[c], mk[c], sw[c])
        want_p.append(np.asarray(p))
        want_s.append(np.asarray(s))
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))
    np.testing.assert_array_equal(np.asarray(got_p), np.stack(want_p))


@pytest.mark.parametrize("seed,L", [(0, 4), (1, 8), (2, 16), (3, 4)])
def test_random_instances(seed, L):
    rng = np.random.default_rng(seed)
    C, N, P = 3, 16 * L, 7
    # small cost range to force many ties
    cost = rng.integers(0, 4, size=(C, N, P)).astype(np.uint32)
    mask = rng.random((C, N, P)) > 0.2
    mask[:, :, 0] |= ~mask.any(axis=2)  # keep at least one path live
    switch = rng.integers(1, 6, size=(C, N)).astype(np.uint32)
    _compare(cost, mask, switch, L)


def test_realistic_costs_and_ties(monkeypatch):
    rng = np.random.default_rng(7)
    C, N, P = 2, 256, 25
    # phred-like costs: mostly 0, occasionally up to 50 (the reference
    # emission range), realistic switch costs 21..60
    cost = np.where(
        rng.random((C, N, P)) < 0.7, 0, rng.integers(0, 51, (C, N, P))
    ).astype(np.uint32)
    mask = np.ones((C, N, P), bool)
    switch = rng.integers(21, 61, size=(C, N)).astype(np.uint32)
    _compare(cost, mask, switch, 16)


def test_all_masked_column_poisons_like_scan():
    """A fully-masked column saturates everything downstream in the
    scan; the blocked path must reproduce the same values/paths."""
    rng = np.random.default_rng(3)
    C, N, P = 1, 64, 5
    cost = rng.integers(0, 3, size=(C, N, P)).astype(np.uint32)
    mask = np.ones((C, N, P), bool)
    mask[0, 20, :] = False
    switch = rng.integers(1, 5, size=(C, N)).astype(np.uint32)
    _compare(cost, mask, switch, 8)


def test_greedy_feedback_loop_matches():
    """Iterated sampling (mask the chosen path per column, penalize its
    allele) — the production greedy loop — must stay identical."""
    rng = np.random.default_rng(11)
    N, P, A, iters = 192, 9, 4, 5
    costs = rng.integers(0, 26, size=(N, A)).astype(np.uint32)
    alleles = rng.integers(0, A, size=(N, P)).astype(np.int32)
    switch = rng.integers(3, 40, size=N).astype(np.uint32)

    def run(fn):
        cs = costs.copy()
        used = np.zeros((N, P), bool)
        out = []
        for _ in range(iters):
            pc = np.take_along_axis(cs, alleles, axis=1)
            path, score = fn(
                jnp.asarray(pc), jnp.asarray(~used), jnp.asarray(switch)
            )
            path = np.asarray(path)
            out.append((path.copy(), int(score)))
            used[np.arange(N), path] = True
            chosen = alleles[np.arange(N), path]
            pen = cs[np.arange(N), chosen] + 10
            cs[np.arange(N), chosen] = np.where(pen > 25, 25, pen)
        return out

    blocked = run(lambda pc, mk, sw: (
        lambda r: (r[0][0, :N], r[1][0])
    )(_blocked_viterbi_jit(pc[None], mk[None], sw[None], L=16)))
    scan = run(_viterbi_iteration)
    for (bp, bs), (sp, ss) in zip(blocked, scan):
        assert bs == ss
        np.testing.assert_array_equal(bp, sp)


def test_auto_padding_dispatch(monkeypatch):
    """_viterbi_iteration_auto pads to a multiple of _BLOCK_L with
    neutral columns; result must equal the unpadded scan."""
    monkeypatch.delenv("PANGENIE_TPU_NO_BLOCKED_SAMPLING", raising=False)
    rng = np.random.default_rng(5)
    N, P = 4096 + 17, 6  # forces padding
    cost = rng.integers(0, 8, size=(N, P)).astype(np.uint32)
    mask = rng.random((N, P)) > 0.1
    mask[:, 2] |= ~mask.any(axis=1)
    switch = rng.integers(1, 30, size=N).astype(np.uint32)
    got_p, got_s = _viterbi_iteration_auto(
        jnp.asarray(cost), jnp.asarray(mask), jnp.asarray(switch)
    )
    want_p, want_s = _viterbi_iteration(
        jnp.asarray(cost), jnp.asarray(mask), jnp.asarray(switch)
    )
    assert int(got_s) == int(want_s)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))


def test_batched_group_engages_blocked(monkeypatch):
    """sample_panels_batched on a >=4096-column chromosome (blocked
    path) must produce the same sampled paths as HaplotypeSampler with
    the blocked path disabled."""
    from pangenie_tpu.hmm.sampling import HaplotypeSampler, _sample_group

    rng = np.random.default_rng(13)
    N, P, A, size = 4100, 8, 3, 3
    costs = rng.integers(0, 26, size=(1, N, A)).astype(np.uint32)
    alleles = rng.integers(0, A, size=(1, N, P)).astype(np.int32)
    switch = np.concatenate(
        [[0], rng.integers(3, 40, size=N - 1)]
    ).astype(np.uint32)[None]
    valid = np.ones((1, N), bool)

    # pad to the segment multiple like sample_panels_batched does
    pad = (-N) % _BLOCK_L
    costs_p = np.pad(costs, ((0, 0), (0, pad), (0, 0)))
    alleles_p = np.pad(alleles, ((0, 0), (0, pad), (0, 0)))
    switch_p = np.pad(switch, ((0, 0), (0, pad)), constant_values=1)
    valid_p = np.pad(valid, ((0, 0), (0, pad)))
    got = np.asarray(_sample_group(
        jnp.asarray(costs_p), jnp.asarray(alleles_p),
        jnp.asarray(switch_p), jnp.asarray(valid_p), size, 10,
    ))[:, 0, :N]

    # ground truth: per-iteration plain scans
    cs = costs[0].copy()
    used = np.zeros((N, P), bool)
    for it in range(size):
        pc = np.take_along_axis(cs, alleles[0], axis=1)
        path, _ = _viterbi_iteration(
            jnp.asarray(pc), jnp.asarray(~used), jnp.asarray(switch[0])
        )
        path = np.asarray(path)
        np.testing.assert_array_equal(got[it], path)
        used[np.arange(N), path] = True
        chosen = alleles[0][np.arange(N), path]
        pen = cs[np.arange(N), chosen] + 10
        cs[np.arange(N), chosen] = np.where(pen > 25, 25, pen)
