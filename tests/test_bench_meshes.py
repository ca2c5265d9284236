"""Benchmark mesh factory: exact-count subdivision and decimation
(bench.py builds the reference's 12-rung bunny ladder from these,
`benchmarks_v2/bunny_3510 ... bunny_10785024`)."""

import numpy as np
import pytest


def test_subdivide_to_exact_counts(bunny_mesh):
    from bench import subdivide_to

    for t in (56172, 168516, 224688):
        c, f = subdivide_to(bunny_mesh.coords, bunny_mesh.faces, t)
        assert f.shape[0] == t
        assert f.min() >= 0 and f.max() < c.shape[0]


def test_decimate_to_exact_counts(bunny_mesh):
    from bench import decimate_to

    for t in (3510, 28086):
        c, f = decimate_to(bunny_mesh.coords, bunny_mesh.faces, t)
        assert f.shape[0] == t
        assert f.min() >= 0 and f.max() < c.shape[0]
        # No degenerate (repeated-index) faces.
        assert (f[:, 0] != f[:, 1]).all()
        assert (f[:, 1] != f[:, 2]).all()
        assert (f[:, 0] != f[:, 2]).all()
        # The coarse proxy keeps the bunny's extent (same bbox scale).
        ptp0 = np.ptp(bunny_mesh.coords, axis=0)
        ptp1 = np.ptp(c, axis=0)
        assert np.all(ptp1 > 0.7 * ptp0) and np.all(ptp1 <= 1.05 * ptp0)


def test_decimate_to_rejects_upscale(bunny_mesh):
    from bench import decimate_to

    with pytest.raises(ValueError, match=">= current"):
        decimate_to(bunny_mesh.coords, bunny_mesh.faces, 10**7)
