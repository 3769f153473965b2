"""Can the per-bounce permutation sort get cheaper?

Baseline: lax.sort([key u32, iota u32], num_keys=1) -> perm (the shipped
_sort_path path). Candidate: pack the TOP bits of the key with the lane id
into ONE u32 (key >> (32-kb)) << lb | lane, sort the single operand, and
read the permutation out of the low bits. Halves sorted bytes; costs key
resolution (kb = 32 - ceil(log2 n) bits survive).

Lost resolution only coarsens WITHIN-block ordering once kb covers
dead|octant|origin-morton (the block-membership bits) -- measured
separately via the cull stats tool.

Run:  python experiments/sort_lane_pack.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    return int(np.asarray(x).ravel()[0])


def timeit(fn, *args, reps=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    for n in (960_000, 1_920_000):
        rng = np.random.default_rng(0)
        key = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32))

        @jax.jit
        def pair_sort(k):
            _, perm = lax.sort([k, lax.iota(jnp.uint32, n)], num_keys=1)
            return perm

        lb = max(1, int(np.ceil(np.log2(n))))
        kb = 32 - lb

        @jax.jit
        def packed_sort(k):
            packed = (k >> jnp.uint32(lb)) << jnp.uint32(lb) | lax.iota(jnp.uint32, n)
            s = lax.sort(packed)
            return s & jnp.uint32((1 << lb) - 1)

        t_pair = timeit(pair_sort, key)
        t_packed = timeit(packed_sort, key)
        print(f"n={n}: pair {t_pair*1e3:.1f} ms | packed(kb={kb}) {t_packed*1e3:.1f} ms"
              f"  ({t_pair/t_packed:.2f}x)")

        # correctness: block membership at 128 must match when key bits agree
        pp = np.asarray(pair_sort(key))
        qq = np.asarray(packed_sort(key))
        k_np = np.asarray(key)
        top = lambda p: (k_np[p] >> lb)
        assert (np.sort(qq) == np.arange(n)).all()
        same = (top(pp) == top(qq)).mean()
        print(f"   top-bit agreement along sorted order: {same:.4f}")


if __name__ == "__main__":
    main()
