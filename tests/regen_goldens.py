"""Regenerate the committed golden images (run after an INTENTIONAL
radiometric change; review the diff before committing):

    python tests/regen_goldens.py [name ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tests.golden_scenes import GOLDENS  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def main():
    os.makedirs(OUT, exist_ok=True)
    names = sys.argv[1:] or sorted(GOLDENS)
    for name in names:
        img = np.asarray(GOLDENS[name]()).astype(np.float16)
        path = os.path.join(OUT, f"{name}.npz")
        np.savez_compressed(path, image=img)
        print(f"{name}: wrote {path} shape={img.shape} mean={float(img.mean()):.4f}")


if __name__ == "__main__":
    main()
