"""Axis-aligned bounding box of point sets.

Behavioral equivalent of `CalculateBoundingBox`
(`vplib/src/bounding_box.h:22-61`): returns the per-axis (min, max) pairs
and the longest side length, which the CLI uses to fit the shared voxel
grid (`apps/cli/main.cpp:77-87`, voxel_size = longest_side / N).
"""

from __future__ import annotations

import numpy as np


def calculate_bounding_box(coords: np.ndarray):
    """Return ``(longest_side, (min_xyz, max_xyz))`` for (P, 3) coords."""
    coords = np.asarray(coords, np.float32).reshape(-1, 3)
    if coords.shape[0] == 0:
        raise ValueError("empty point set")
    mins = coords.min(axis=0)
    maxs = coords.max(axis=0)
    side = float((maxs - mins).max())
    return side, (mins, maxs)
