"""SparseCore worklist path for pair-granular sweep scheduling (gated).

Why this exists: the cluster sweep evaluates whole (128-ray, C-triangle)
blocks gated per member cluster. Per-ray candidate sets are ~10x smaller
than per-block unions on bounce wavefronts (PERF_NOTES.md "rebinning
study": 9.8 candidate clusters/ray vs ~98.8 evaluated per block), but
packing (ray, cluster) pairs into dense cluster-major blocks needs stream
compaction / binning, which XLA:TPU can only express through sorts,
nonzero and scatters running at 3-16 GB/s — measured to cancel the entire
eval win. The TPU's SparseCore block is designed for exactly these
irregular primitives; JAX exposes them as `jax.experimental.pallas.tpu_sc`
(store_compressed / load_gather / sort_key_val / scan_count / cumsum).

Capability reality (probed, experiments/sparsecore_probe_result.txt):
**v5e/v5-lite has NO SparseCore block** (`get_sparse_core_info().num_cores
== 0`) — the v5p / v6e / TPU7x generations have it. This module therefore
lands the worklist algorithms in three layers so the framework is ready
the day an SC-bearing chip is attached:

  1. `*_xla` — reference implementations in plain jnp (always available;
     these ARE the measured-slow glue, fine at test scale and the correct
     semantics contract).
  2. `*_sc_plan` — the value-level SparseCore program (sort_key_val /
     cumsum / scan_count dataflow). Traceable ANYWHERE via
     `jax.eval_shape` (the primitives carry abstract-eval rules), which
     the tests pin; executable only on SC hardware.
  3. `sc_*` dispatchers — pick the SC path iff `sparsecore_available()`,
     else fall back to the XLA reference. Never raise off-hardware.

The ref-writing kernel wrappers (`store_compressed` into output refs under
a `VectorSubcoreMesh`) are deliberately thin: the mesh class itself
validates against the chip's SC info at construction, so they can only be
built on real SC hardware (see `_sc_compact_kernel_body`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.lru_cache(maxsize=1)
def sparsecore_available() -> bool:
    """True iff the attached TPU has a SparseCore block (v5p/v6e/TPU7x;
    v5e probes num_cores=0). False on CPU and on import/probe failure."""
    try:
        from jax.experimental.pallas import tpu_sc as plsc

        if jax.devices()[0].platform != "tpu":
            return False
        info = plsc.get_sparse_core_info()
        return int(getattr(info, "num_cores", 0)) > 0
    except Exception:
        return False


# --------------------------------------------------------------------------
# stream compaction: flags -> packed indices
# --------------------------------------------------------------------------

def compact_indices_xla(flags: Array, capacity: int) -> tuple[Array, Array]:
    """Reference: packed indices of set flags, padded with -1.

    Returns (idx[capacity] int32, n scalar int32). The XLA lowering routes
    through a full sort — the measured-slow path this module exists to
    replace on SC hardware."""
    n = flags.shape[0]
    # stable sort by ~flag keeps set-flag indices first, in order
    key = (~flags).astype(jnp.int32)
    _, idx = jax.lax.sort([key, jax.lax.iota(jnp.int32, n)], num_keys=1)
    cnt = jnp.sum(flags.astype(jnp.int32))
    take = min(capacity, n)
    out = idx[:take]
    if capacity > n:
        out = jnp.concatenate(
            [out, jnp.full((capacity - n,), -1, jnp.int32)])
    out = jnp.where(jnp.arange(capacity) < cnt, out, -1)
    return out, cnt


def compact_indices_sc_plan(flags: Array) -> tuple[Array, Array, Array]:
    """Value-level SparseCore compaction plan (traceable off-hardware).

    Returns (dest, mask, n): element i of the input belongs at packed slot
    `dest[i]` when `mask[i]`; `n` is the packed count. On SC hardware the
    kernel wrapper turns this into ONE `store_compressed` (which performs
    the dest computation in silicon); the plan's cumsum expresses the same
    dataflow for shape/type validation and for documentation parity."""
    from jax.experimental.pallas import tpu_sc as plsc

    pos = plsc.cumsum(flags.astype(jnp.int32))
    dest = pos - 1
    n = pos[-1]
    return dest, flags, n


def _sc_compact_kernel_body(flags_ref, idx_ref, cnt_ref):
    """SparseCore kernel body (runs under `pl.core_map(VectorSubcoreMesh)`,
    i.e. on an SC chip only): one store_compressed writes the i-th set
    flag's index to idx_ref[i] (sc_primitives.store_compressed contract:
    x must have the SAME shape as the ref, so idx_ref is sized (n,) — the
    dispatcher shapes the result to `capacity` outside), population count
    to cnt. idx_ref arrives pre-filled with -1, so slots >= count keep the
    XLA reference's padding value."""
    from jax.experimental.pallas import tpu_sc as plsc

    flags = flags_ref[...]
    n = flags.shape[0]
    idx = jax.lax.iota(jnp.int32, n)
    plsc.store_compressed(idx_ref, idx, mask=flags)
    cnt_ref[0] = jnp.sum(flags.astype(jnp.int32))


def sc_compact_indices(flags: Array, capacity: int) -> tuple[Array, Array]:
    """Dispatcher: SC kernel on SC hardware, XLA reference elsewhere."""
    if not sparsecore_available():
        return compact_indices_xla(flags, capacity)
    # SC path: core_map over the vector subcores (hardware-only; the mesh
    # constructor itself refuses chips without an SC block). core_map
    # kernels are stateful — they communicate through the run_state refs.
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu_sc as plsc

    mesh = plsc.VectorSubcoreMesh(core_axis_name="core",
                                  subcore_axis_name="subcore", num_cores=1)
    n = flags.shape[0]

    def stateful(refs):
        flags_ref, idx_ref, cnt_ref = refs

        @functools.partial(pl.core_map, mesh)
        def _():
            # single-subcore worklist build: the compaction is one serial
            # store_compressed (SC silicon does the packing); fan-out over
            # subcores belongs to the consumer gather, not the build
            first = (jax.lax.axis_index("core") == 0) & (
                jax.lax.axis_index("subcore") == 0)

            @pl.when(first)
            def _():
                _sc_compact_kernel_body(flags_ref, idx_ref, cnt_ref)

    _, idx, cnt = pl.run_state(stateful)(
        (flags, jnp.full((n,), -1, jnp.int32), jnp.zeros((1,), jnp.int32)))
    cnt = cnt[0]
    # shape to `capacity` with the XLA reference's exact padding contract
    out = idx[: min(capacity, n)]
    if capacity > n:
        out = jnp.concatenate(
            [out, jnp.full((capacity - n,), -1, jnp.int32)])
    return jnp.where(jnp.arange(capacity) < cnt, out, -1), cnt


# --------------------------------------------------------------------------
# pair worklist: per-row candidate bitmask -> cluster-major packed pairs
# --------------------------------------------------------------------------

def pair_worklist_xla(bits: Array, capacity: int) -> tuple[Array, Array, Array]:
    """Reference: expand (R,) uint32 member masks into packed (row, col)
    pairs sorted cluster-major (col, then row), padded with -1.

    This is the binning the cluster sweep would need for pair-granular
    scheduling; at bench scale the sort+gather glue here measured ~180-250
    ms per sweep (PERF_NOTES "rebinning study") — the SC path's reason to
    exist."""
    r = bits.shape[0]
    w = 32
    rows = jnp.repeat(jnp.arange(r, dtype=jnp.int32), w)
    cols = jnp.tile(jnp.arange(w, dtype=jnp.int32), r)
    valid = ((jnp.repeat(bits, w) >> cols.astype(jnp.uint32)) & 1) != 0
    # cluster-major key; invalid pairs sort to the back
    key = jnp.where(valid, cols * r + rows, jnp.int32(w * r))
    _, srow, scol = jax.lax.sort([key, rows, cols], num_keys=1)
    cnt = jnp.sum(valid.astype(jnp.int32))
    take = min(capacity, r * w)
    pad = capacity - take
    srow, scol = srow[:take], scol[:take]
    if pad > 0:
        srow = jnp.concatenate([srow, jnp.full((pad,), -1, jnp.int32)])
        scol = jnp.concatenate([scol, jnp.full((pad,), -1, jnp.int32)])
    keep = jnp.arange(capacity) < cnt
    return jnp.where(keep, srow, -1), jnp.where(keep, scol, -1), cnt


def pair_worklist_sc_plan(bits: Array) -> tuple[Array, Array]:
    """Value-level SC plan for the pair expansion: one masked
    sort_key_val over the (R*32,) candidate slots orders pairs
    cluster-major; scan_count ranks duplicates per cluster (the per-bin
    write offsets store_compressed consumes on hardware). Traceable
    anywhere; the tests eval_shape it."""
    from jax.experimental.pallas import tpu_sc as plsc

    r = bits.shape[0]
    w = 32
    rows = jnp.repeat(jnp.arange(r, dtype=jnp.int32), w)
    cols = jnp.tile(jnp.arange(w, dtype=jnp.int32), r)
    valid = ((jnp.repeat(bits, w) >> cols.astype(jnp.uint32)) & 1) != 0
    key = cols * r + rows
    packed = rows * w + cols
    # with a mask, sort_key_val returns (keys, values, out_mask) and pushes
    # the masked-out slots to the LAST positions (sc_primitives contract) —
    # the first popcount(bits) values are exactly the valid pairs in
    # cluster-major order
    _skeys, sorted_pairs, _omask = plsc.sort_key_val(key, packed, mask=valid)
    rank, _last = plsc.scan_count(cols, mask=valid)
    return sorted_pairs, rank


def sc_pair_worklist(bits: Array, capacity: int) -> tuple[Array, Array, Array]:
    """Dispatcher: SC plan on SC hardware, XLA reference elsewhere."""
    if not sparsecore_available():
        return pair_worklist_xla(bits, capacity)
    sorted_pairs, _rank = pair_worklist_sc_plan(bits)
    r, w = bits.shape[0], 32
    cnt = jnp.sum(
        jax.lax.population_count(bits.astype(jnp.uint32)).astype(jnp.int32))
    # shape to `capacity` with the XLA reference's exact padding contract
    sp = sorted_pairs[: min(capacity, r * w)]
    if capacity > r * w:
        sp = jnp.concatenate(
            [sp, jnp.full((capacity - r * w,), -1, jnp.int32)])
    keep = jnp.arange(capacity) < cnt
    return (jnp.where(keep, sp // w, -1).astype(jnp.int32),
            jnp.where(keep, sp % w, -1).astype(jnp.int32), cnt)
