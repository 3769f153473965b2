"""Size the per-bounce _sort_path cost (pack -> row-gather -> unpack) at
bench wavefront shape on the real TPU, vs its parts.

The fusion-diet question (PERF_NOTES round-3 item 3): of the ~0.95 s
non-sweep frame time, how much is the sorted-wavefront state churn?

Run:  python experiments/sortpath_cost.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from optixpathtracer_tpu.engine.wavefront import (
        _pack_u32,
        _sort_path,
        _unpack_u32,
        permute_packed,
    )

    n = 960_000  # one bench dispatch tile (1200*800*2spp / 2 tiles)
    n_f32 = 30   # f32-ish leaves of the bounce path state
    n_u32 = 6
    rng = np.random.default_rng(0)
    leaves = [jnp.asarray(rng.random(n, np.float32)) for _ in range(n_f32)]
    leaves += [jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.uint32))
               for _ in range(n_u32)]
    key = jnp.asarray(rng.integers(0, 1 << 22, n).astype(np.uint32))
    path = {f"f{i}": v for i, v in enumerate(leaves)}
    path["rays"] = jnp.float32(0.0)
    path["ovf"] = jnp.float32(0.0)

    t_sort_path = timeit(
        jax.jit(lambda p, k: _sort_path(p, k)["f0"]), path, key
    )
    print(f"_sort_path full ({len(leaves)} leaves, n={n}): {t_sort_path*1e3:.1f} ms")

    t_perm_only = timeit(
        jax.jit(
            lambda ls, k: permute_packed(
                ls, jax.lax.sort([k, jax.lax.iota(jnp.uint32, n)], num_keys=1)[1]
            )[0]
        ),
        leaves, key,
    )
    print(f"  sort + permute_packed: {t_perm_only*1e3:.1f} ms")

    t_sortonly = timeit(
        jax.jit(lambda k: jax.lax.sort(
            [k, jax.lax.iota(jnp.uint32, n)], num_keys=1)[1]),
        key,
    )
    print(f"  (key, iota) sort only: {t_sortonly*1e3:.1f} ms")

    t_pack = timeit(jax.jit(lambda ls: _pack_u32(ls)), leaves)
    print(f"  pack only: {t_pack*1e3:.1f} ms")

    packed = jax.jit(_pack_u32)(leaves)
    perm = jax.jit(
        lambda k: jax.lax.sort([k, jax.lax.iota(jnp.uint32, n)], num_keys=1)[1]
    )(key)
    t_gather = timeit(jax.jit(lambda m, p: m[p]), packed, perm)
    print(f"  row gather only: {t_gather*1e3:.1f} ms")

    t_unpack = timeit(
        jax.jit(lambda m, ls: _unpack_u32(m, ls)[0]), packed, leaves
    )
    print(f"  unpack only (to f0 consume): {t_unpack*1e3:.1f} ms")

    # per frame: bounce sorts (5) + shadow sorts (4, until nee_final off -> 4)
    # x 2 tiles
    est = t_sort_path * 10
    print(f"frame estimate at 10 sorts: {est*1e3:.0f} ms")


if __name__ == "__main__":
    main()
