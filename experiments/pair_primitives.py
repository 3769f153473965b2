"""Microbenchmark the XLA primitives a pair-packed sweep would lean on.

The rebinning analysis (perray_stats.py) shows ~10x less M-T eval compute if
(ray, cluster) candidate pairs are packed into full 128-lane blocks per
cluster instead of walking block-unions. Whether that wins depends on the
host-side glue costs this script measures at sweep scale (524288 rays,
M=608 clusters, ~5M pairs):

  sort2        lax.sort [cluster u32, ray u32] over P pairs (pair binning)
  sort3_2key   lax.sort [ray, t_bits, iota] num_keys=2 (per-ray winner pick)
  row_gather   rays8[pair_ray] packed-row gather (P, 8) f32
  row_scatter  (P, 4).at[perm].set(rows) unique-index scatter (inverse perm)
  nonzero      jnp.nonzero(flat_bool80M, size=P) (pair extraction)
  cumsum       jnp.cumsum over 80M i32 (extraction by hand)
  transpose    (131072, 608) i8 -> (608, 131072) (cluster-major extraction)
  searchsorted 524288 queries into a sorted 5M array (run-start lookup)

Timing: jit each op, warm up, then time 5 iterations each hard-synced by
fetching a scalar slice (block_until_ready lies through the axon tunnel).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5):
    # wrap: reduce every output to ONE scalar inside the jit (prevents DCE,
    # and the sync fetch moves 4 bytes, not the result, through the tunnel)
    red = jax.jit(lambda *a: sum(
        jnp.sum(o.astype(jnp.float32)) for o in jax.tree_util.tree_leaves(fn(*a))))
    _ = float(red(*args))  # warm up / compile
    t0 = time.perf_counter()
    for _i in range(iters):
        _ = float(red(*args))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    P = 5 * 1024 * 1024
    N = 524288
    M = 608

    cl = jnp.asarray(rng.integers(0, M, P, dtype=np.uint32))
    ray = jnp.asarray(rng.integers(0, N, P, dtype=np.uint32))
    tb = jnp.asarray(rng.integers(0, 1 << 30, P, dtype=np.uint32))
    iota = jnp.arange(P, dtype=jnp.uint32)
    rays8 = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    rows4 = jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(P).astype(np.int32))
    flat = jnp.asarray((rng.random(80 * 1024 * 1024) < 0.016))
    flat_i = flat.astype(jnp.int32)
    mat = jnp.asarray(rng.integers(0, 2, (131072, M), dtype=np.int8))
    sorted_big = jnp.asarray(np.sort(rng.integers(0, N, P).astype(np.int32)))
    queries = jnp.asarray(np.arange(N, dtype=np.int32))

    res = {}
    res["sort2_ms"] = timeit(
        (lambda a, b: jax.lax.sort([a, b], num_keys=1)), cl, ray)
    res["sort3_2key_ms"] = timeit(
        (lambda a, b, c: jax.lax.sort([a, b, c], num_keys=2)),
        ray, tb, iota)
    res["row_gather_ms"] = timeit(
        (lambda r8, ix: r8[ix]), rays8, ray.astype(jnp.int32))
    res["row_scatter_ms"] = timeit(
        (lambda dst, p, src: dst.at[p].set(src)),
        rows4, perm, rows4)
    res["nonzero_ms"] = timeit(
        (lambda f: jnp.nonzero(f, size=P, fill_value=-1)[0]), flat)
    res["cumsum80M_ms"] = timeit((lambda f: jnp.cumsum(f)), flat_i)
    res["transpose_ms"] = timeit(
        (lambda m: m.T.reshape(-1)), mat)
    res["searchsorted_ms"] = timeit(
        (lambda a, q: jnp.searchsorted(a, q)), sorted_big, queries)
    print(json.dumps({k: round(v, 2) for k, v in res.items()}, indent=1))


if __name__ == "__main__":
    main()
