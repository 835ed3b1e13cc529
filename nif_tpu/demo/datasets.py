"""Bundled demo datasets.

API parity with the reference demo classes (reference nif/demo/
traveling_wave.py, traveling_wave_high_freq.py, cylinderflow.py): each is a
``PointWiseData`` subclass exposing ``.data/.parameter/.x/.u`` plus
``.mean/.std`` (and ``.sample_weight`` for the area-weighted case).

Instead of shipping opaque ``.npz`` blobs, the fields are generated
analytically and deterministically at construction time — same shapes
(2000 x 3 for the 1-D waves), same normalization paths:

* ``TravelingWave``        — Gaussian pulse advecting at speed c
  (the tutorial-1 "hello world" field), standard-normalized.
* ``TravelingWaveHighFreq`` — high-frequency traveling sine wave
  (the multi-scale stress case), minmax-normalized.
* ``CylinderFlow``         — a 2-D analytic vortex-street-like (u, v) field
  on scattered points with nonuniform cell areas, minmax + area-weighted.
  (The reference's AMR snapshot blob is absent from its own mirror; this is
  a synthetic stand-in with the same schema ``[t, x, y, u, v, area]``.)
"""
from __future__ import annotations

import numpy as np

from ..data.point_wise_data import PointWiseData

__all__ = ["TravelingWave", "TravelingWaveHighFreq", "CylinderFlow"]


def _traveling_wave_raw(n_t=20, n_x=100, freq=1.0, speed=1.0):
    """Rows of [t, x, u] on a (n_t, n_x) grid, flattened point-wise."""
    t = np.linspace(0.0, 1.0, n_t, endpoint=False)
    x = np.linspace(0.0, 1.0, n_x, endpoint=False)
    tt, xx = np.meshgrid(t, x, indexing="ij")
    u = np.sin(2.0 * np.pi * freq * (xx - speed * tt))
    return np.stack([tt.ravel(), xx.ravel(), u.ravel()], axis=-1).astype(np.float32)


class TravelingWave(PointWiseData):
    """1-D traveling pulse, 2000 points, standard-normalized (tutorial 1)."""

    def __init__(self, n_t: int = 20, n_x: int = 100):
        t = np.linspace(0.0, 1.0, n_t, endpoint=False)
        x = np.linspace(0.0, 1.0, n_x, endpoint=False)
        tt, xx = np.meshgrid(t, x, indexing="ij")
        # Periodic Gaussian pulse advecting at speed 1.
        d = np.mod(xx - tt - 0.2, 1.0) - 0.5
        u = np.exp(-50.0 * d**2)
        data = np.stack([tt.ravel(), xx.ravel(), u.ravel()], axis=-1).astype(np.float32)
        super().__init__(data[:, [0]], data[:, [1]], data[:, [2]])
        self.data, self.mean, self.std = self.standard_normalize(self.data_raw)
        self.n_t, self.n_x_grid = n_t, n_x


class TravelingWaveHighFreq(PointWiseData):
    """High-frequency 1-D traveling wave, minmax-normalized (tutorials 2/6/8)."""

    def __init__(self, n_t: int = 20, n_x: int = 100, freq: float = 10.0):
        data = _traveling_wave_raw(n_t, n_x, freq=freq, speed=1.0)
        super().__init__(data[:, [0]], data[:, [1]], data[:, [2]])
        self.data, self.mean, self.std = self.minmax_normalize(
            self.data_raw, n_para=self.n_p, n_x=self.n_x, n_target=1
        )
        self.n_t, self.n_x_grid = n_t, n_x


class CylinderFlow(PointWiseData):
    """Synthetic 2-D vortex-street-like flow with AMR-style area weights
    (tutorial 3 schema: [t, x, y, u, v, area])."""

    def __init__(self, n_t: int = 10, n_pts: int = 600, seed: int = 0):
        rng = np.random.default_rng(seed)
        t = np.repeat(np.linspace(0.0, 1.0, n_t, endpoint=False), n_pts)
        # Scattered points, denser near the "cylinder" at the origin —
        # mimicking adaptive mesh refinement.
        r = rng.uniform(0.15, 1.0, size=n_t * n_pts) ** 1.5 * 4.0 + 0.5
        th = rng.uniform(-np.pi, np.pi, size=n_t * n_pts)
        x = r * np.cos(th)
        y = r * np.sin(th) * 0.5
        # Cell area grows with distance from the body (coarser cells).
        area = (0.05 + 0.1 * r) ** 2
        # Advecting vortex street: alternating vortices downstream.
        k, om = 2.0 * np.pi / 2.0, 2.0 * np.pi
        psi = np.exp(-(y**2) * 2.0) * np.sin(k * x - om * t)
        u = 1.0 - np.exp(-(y**2)) * np.cos(k * x - om * t) * 0.5
        v = psi * 0.5
        data = np.stack([t, x, y, u, v, area], axis=-1).astype(np.float32)
        super().__init__(data[:, [0]], data[:, [1, 2]], data[:, [3, 4]], data[:, -1:])
        self.data, self.mean, self.std, self.sample_weight = self.minmax_normalize(
            self.data_raw, n_para=self.n_p, n_x=self.n_x, n_target=2, area_weighted=True
        )
