"""SparseCore worklist path (ops/sc_worklist.py): the capability-gated
compaction/binning layer for pair-granular sweep scheduling.

v5e (and the CPU test mesh) have no SparseCore block, so these tests pin
what IS verifiable off-hardware: the XLA reference semantics vs numpy, the
dispatcher falling back cleanly, and the SC value-level plans tracing with
the right shapes/dtypes (the tpu_sc primitives carry abstract-eval rules,
so jax.eval_shape validates the kernel dataflow without an SC chip)."""
import jax
import jax.numpy as jnp
import numpy as np

from optixpathtracer_tpu.ops.sc_worklist import (
    compact_indices_sc_plan,
    compact_indices_xla,
    pair_worklist_sc_plan,
    pair_worklist_xla,
    sc_compact_indices,
    sc_pair_worklist,
    sparsecore_available,
)


def test_capability_probe_is_false_here_and_never_raises():
    assert sparsecore_available() is False  # CPU test mesh has no SC block


def test_compact_indices_reference_matches_numpy(rng):
    n, cap = 257, 300
    flags = rng.random(n) < 0.3
    idx, cnt = compact_indices_xla(jnp.asarray(flags), cap)
    want = np.nonzero(flags)[0]
    assert int(cnt) == len(want)
    got = np.asarray(idx)
    np.testing.assert_array_equal(got[: len(want)], want)
    assert (got[len(want):] == -1).all()


def test_compact_indices_dispatcher_falls_back(rng):
    flags = jnp.asarray(rng.random(64) < 0.5)
    a = sc_compact_indices(flags, 64)
    b = compact_indices_xla(flags, 64)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert int(a[1]) == int(b[1])


def test_pair_worklist_reference_matches_numpy(rng):
    r, cap = 37, 37 * 32
    bits = rng.integers(0, 1 << 32, r, dtype=np.uint32)
    row, col, cnt = pair_worklist_xla(jnp.asarray(bits), cap)
    # numpy ground truth: all (row, col) with bit set, cluster-major order
    want = sorted(
        ((rr, cc) for rr in range(r) for cc in range(32)
         if (int(bits[rr]) >> cc) & 1),
        key=lambda p: (p[1], p[0]),
    )
    assert int(cnt) == len(want)
    got = list(zip(np.asarray(row)[: len(want)].tolist(),
                   np.asarray(col)[: len(want)].tolist()))
    assert got == want
    assert (np.asarray(row)[len(want):] == -1).all()


def test_pair_worklist_dispatcher_falls_back(rng):
    bits = jnp.asarray(rng.integers(0, 1 << 32, 16, dtype=np.uint32))
    a = sc_pair_worklist(bits, 16 * 32)
    b = pair_worklist_xla(bits, 16 * 32)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_padding_contracts_when_capacity_exceeds_input(rng):
    """capacity > n (compaction) and capacity > r*32 (pairs) must pad with
    -1, not broadcast-error or return garbage — the dispatcher contract the
    SC hardware path also implements."""
    flags = rng.random(40) < 0.5
    idx, cnt = compact_indices_xla(jnp.asarray(flags), 64)
    want = np.nonzero(flags)[0]
    assert int(cnt) == len(want)
    np.testing.assert_array_equal(np.asarray(idx)[: len(want)], want)
    assert (np.asarray(idx)[len(want):] == -1).all()

    bits = rng.integers(0, 1 << 32, 4, dtype=np.uint32)
    row, col, cnt = pair_worklist_xla(jnp.asarray(bits), 4 * 32 + 50)
    n_want = sum(int(b).bit_count() for b in bits)
    assert int(cnt) == n_want
    assert (np.asarray(row)[n_want:] == -1).all()
    assert (np.asarray(col)[n_want:] == -1).all()


def test_sc_plans_trace_with_correct_shapes():
    """The SC programs must TRACE off-hardware: eval_shape runs the
    abstract-eval rules of cumsum / sort_key_val / scan_count — the same
    validation the Mosaic lowering starts from on an SC chip."""
    n = 512
    dest, mask, cnt = jax.eval_shape(
        compact_indices_sc_plan,
        jax.ShapeDtypeStruct((n,), jnp.bool_),
    )
    assert dest.shape == (n,) and dest.dtype == jnp.int32
    assert mask.shape == (n,) and mask.dtype == jnp.bool_
    assert cnt.shape == () and cnt.dtype == jnp.int32

    # the pair plan's sort_key_val validates shapes against the CHIP's
    # SparseCore lane layout even at trace time, so off-TPU the boundary is
    # a specific ValueError (not a crash deeper in) — pin it so an API
    # change in jax surfaces here, and so the plan traces the day a real
    # TPU device kind is attached
    r = 64
    try:
        pairs, rank = jax.eval_shape(
            pair_worklist_sc_plan,
            jax.ShapeDtypeStruct((r,), jnp.uint32),
        )
        assert pairs.shape == (r * 32,) and pairs.dtype == jnp.int32
        assert rank.shape == (r * 32,)
    except ValueError as e:
        assert "Unsupported TPU device kind" in str(e), e
