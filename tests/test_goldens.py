"""Golden-image regression suite (SURVEY.md §4 test-pyramid item 3).

Each preset renders a small deterministic frame on the exact CPU lockstep
path and must match its committed golden within a tight RMSE — this catches
silent radiometric regressions (MIS weights, BSDF lobes, accumulation math)
that unit tests miss. Regenerate with tests/regen_goldens.py after an
intentional change and review the image diff.
"""
import os

import numpy as np
import pytest

from tests.golden_scenes import GOLDENS

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")

# deterministic same-RNG renders: differences can only come from op-order /
# platform float drift, so the tolerance is tight
RMSE_TOL = 2e-3


# heavy renders go to the slow tier; every preset also has a small fast-tier
# golden (the *_s variants in golden_scenes.py) so the default run pins the
# whole radiometric surface (VERDICT r3 item 6)
_SLOW_GOLDENS = {
    "whitted", "foveated", "loft", "disney_cornell", "disney_open", "spectral",
}
# a renamed/removed golden must fail loudly, not silently unmark (ADVICE r3)
assert _SLOW_GOLDENS <= set(GOLDENS), _SLOW_GOLDENS - set(GOLDENS)


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=[pytest.mark.slow] if n in _SLOW_GOLDENS else [])
        for n in sorted(GOLDENS)
    ],
)
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"missing golden {path}; run tests/regen_goldens.py {name}"
    )
    want = np.load(path)["image"].astype(np.float32)
    got = np.asarray(GOLDENS[name]()).astype(np.float32)
    assert got.shape == want.shape
    # compare in tone-mapped space so huge emitter values don't dominate
    a = np.sqrt(np.clip(got, 0, None))
    b = np.sqrt(np.clip(want, 0, None))
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    assert rmse <= RMSE_TOL, f"{name}: RMSE {rmse:.5f} vs golden"
