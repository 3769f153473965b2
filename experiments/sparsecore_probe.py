"""SparseCore probe — can this chip lift the 26 GB/s random-gather wall?

Round-1 idea 7 / round-2 VERDICT item 3: v5-class TPUs ship embedding
("Sparse") cores built for random row gathers; if JAX exposes them they
could replace the XLA gather path that capped the BFS/worklist traversal
formulation at ~26 GB/s effective (PERF_NOTES.md "Measured walls").

JAX 0.9.0 DOES expose SparseCore Pallas (jax.experimental.pallas.tpu_sc:
load_gather / store_scatter / store_compressed / sort_key_val / cumsum —
exactly the compaction primitives the TensorCore lacks). Whether the
CURRENT chip has the hardware is a per-generation question:
jax._src.pallas.mosaic.tpu_info gives sparse_core=None for "TPU v5 lite"
(v5e) and real SparseCoreInfo only for v5p, v6e, and TPU7x.

Run on the TPU (one tunnel client at a time):
    python experiments/sparsecore_probe.py

Records (stdout, one JSON line at the end):
  - device kind + SparseCoreInfo
  - XLA take() random-row-gather GB/s baseline at two sizes (the wall)
  - if SparseCore present: a load_gather kernel's GB/s on the same access
    pattern; else "absent" with the per-generation table.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync_scalar(x) -> float:
    # block_until_ready() through the axon tunnel returns before the remote
    # computation finishes (PERF_NOTES.md "Measurement hygiene") — fetch a
    # scalar to force a real sync.
    return float(jnp.sum(x[:1]))


def xla_gather_gbs(n_rows: int, row_width: int, n_idx: int, iters: int = 5) -> float:
    table = jnp.arange(n_rows * row_width, dtype=jnp.float32).reshape(
        n_rows, row_width
    )
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, n_rows, size=n_idx), jnp.int32
    )

    @jax.jit
    def f(t, i):
        return jnp.take(t, i, axis=0)

    out = f(table, idx)
    _sync_scalar(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(table, idx)
        _sync_scalar(out)
    dt = (time.perf_counter() - t0) / iters
    return n_idx * row_width * 4 / dt / 1e9


def sparsecore_gather_gbs(n_rows: int, row_width: int, n_idx: int) -> float | None:
    """Measure an SC-kernel random row gather, or None if lowering fails."""
    try:
        from jax.experimental.pallas import tpu_sc  # noqa: F401
        from jax.experimental import pallas as pl
        from jax._src.pallas.mosaic import sc_primitives  # noqa: F401
    except ImportError:
        return None
    # Intentionally minimal: if the chip has no SparseCore the mosaic
    # lowering rejects the VectorSubcoreMesh before anything runs.
    try:
        import functools

        mesh = tpu_sc.VectorSubcoreMesh(
            core_axis_name="core", subcore_axis_name="subcore",
            num_cores=tpu_sc.get_sparse_core_info().num_cores,
        )
        table = jnp.arange(n_rows * row_width, dtype=jnp.float32).reshape(
            n_rows, row_width
        )
        idx = jnp.asarray(
            np.random.default_rng(0).integers(0, n_rows, size=n_idx), jnp.int32
        )

        def kernel(tab_ref, idx_ref, out_ref):
            ids = idx_ref[...]
            out_ref[...] = tpu_sc.load_gather(tab_ref, ids)

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_idx, row_width), jnp.float32),
            # SC kernels use sc BlockSpecs; keep whole arrays resident
            in_specs=[tpu_sc.BlockSpec(), tpu_sc.BlockSpec()],
            out_specs=tpu_sc.BlockSpec(),
            mesh=mesh,
        )
        out = f(table, idx)
        _sync_scalar(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(table, idx)
            _sync_scalar(out)
        dt = (time.perf_counter() - t0) / 5
        return n_idx * row_width * 4 / dt / 1e9
    except Exception as e:  # noqa: BLE001 — probe records, never crashes
        print(f"SC kernel lowering/run failed: {type(e).__name__}: {e}")
        return None


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    from jax.experimental.pallas import tpu_sc

    info = tpu_sc.get_sparse_core_info()
    print(f"sparse_core info: {info}")
    present = info.num_cores > 0

    res = {
        "device_kind": dev.device_kind,
        "sparsecore_cores": info.num_cores,
        "sparsecore_subcores": info.num_subcores,
    }
    # the wall this probe is about, re-measured today for the record
    res["xla_gather_gbs_64k"] = round(xla_gather_gbs(1 << 20, 128, 1 << 16), 2)
    res["xla_gather_gbs_1m"] = round(xla_gather_gbs(1 << 20, 128, 1 << 20), 2)

    if present:
        sc = sparsecore_gather_gbs(1 << 20, 128, 1 << 20)
        res["sc_gather_gbs_1m"] = None if sc is None else round(sc, 2)
    else:
        res["sc_gather_gbs_1m"] = None
        res["verdict"] = (
            "SparseCore ABSENT on this chip generation (v5e/v5-lite has no "
            "sparse_core block; v5p/v6e/TPU7x do). The JAX API (pallas.tpu_sc) "
            "is ready when the hardware is."
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
