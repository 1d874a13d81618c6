"""Live sklearn/cv2 parity bakeoff (VERDICT r7 missing-item #1).

Neither library ships in this build sandbox, so these cases SKIP
here; the moment the test environment grows opencv-python /
scikit-learn they run automatically. `tools/kmeans_bakeoff.py` is the
standalone runnable form with the full rationale.
"""

from __future__ import annotations

import importlib.util

import pytest

_HAS_CV2 = importlib.util.find_spec("cv2") is not None
_HAS_SKLEARN = importlib.util.find_spec("sklearn") is not None


@pytest.mark.skipif(not _HAS_CV2, reason="cv2 not installed in this sandbox")
def test_hsv_twins_match_cv2_exactly():
    import cv2

    from tools.kmeans_bakeoff import check_hsv_twins

    assert check_hsv_twins(cv2) == []


@pytest.mark.skipif(
    not _HAS_SKLEARN, reason="sklearn not installed in this sandbox"
)
def test_kmeans_inertia_within_caps_of_sklearn():
    from sklearn.cluster import KMeans

    from tools.kmeans_bakeoff import check_kmeans_parity

    assert check_kmeans_parity(KMeans) == []


def test_bakeoff_populations_are_well_formed():
    """The sandbox-runnable part: the bakeoff's population generator
    itself (fixture family, adversarial blobs, noise) must stay
    importable and produce 6-clusterable data, so the skipped cases
    above cannot rot."""
    import numpy as np

    from tools.kmeans_bakeoff import bakeoff_populations, color_lattice

    pops = bakeoff_populations()
    assert len(pops) == 7
    for name, px in pops:
        assert px.ndim == 2 and px.shape[1] == 3, name
        assert len(np.unique(px, axis=0)) >= 6, name
    lat = color_lattice()
    assert len(lat) == 52 ** 3 + 100_000
