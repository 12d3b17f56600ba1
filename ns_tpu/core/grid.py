"""Grid descriptions for the solver families.

The reference hardcodes three grid conventions:
  - uniform FD grid on [-1,1]^2 with dx = 2/(n-1)
    (direct_fd/simulate.py:53, chorin_fd/simulate.py:58)
  - Gauss-Lobatto collocation points x_i = cos(pi i/(N-1)) with the quirk
    dx = 2/n (chorin_spectral/simulate.py:48,395-399)
  - (new, north-star config) periodic Fourier grid on [0, 2*pi)^2

Grids are static python configuration (shapes must be static under jit).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid:
    nx: int
    ny: int
    kind: str = "uniform"  # 'uniform' | 'gauss_lobatto' | 'periodic'

    def __post_init__(self):
        if self.kind not in ("uniform", "gauss_lobatto", "periodic"):
            raise ValueError(f"unknown grid kind {self.kind!r}")

    @property
    def dx(self) -> float:
        if self.kind == "uniform":
            return 2.0 / (self.nx - 1)  # ref direct_fd/simulate.py:53
        if self.kind == "gauss_lobatto":
            return 2.0 / self.nx  # ref chorin_spectral/simulate.py:48
        return 2.0 * np.pi / self.nx  # periodic

    @property
    def dy(self) -> float:
        if self.kind == "uniform":
            return 2.0 / (self.ny - 1)
        if self.kind == "gauss_lobatto":
            return 2.0 / self.ny
        return 2.0 * np.pi / self.ny

    def x(self) -> np.ndarray:
        """1D coordinate vector along x (host-side, float64)."""
        if self.kind == "uniform":
            return np.linspace(-1.0, 1.0, self.nx)
        if self.kind == "gauss_lobatto":
            i = np.arange(self.nx)
            return np.cos(np.pi * i / float(self.nx - 1))  # ref :395-399
        return np.arange(self.nx) * self.dx

    def y(self) -> np.ndarray:
        if self.kind == "uniform":
            return np.linspace(-1.0, 1.0, self.ny)
        if self.kind == "gauss_lobatto":
            i = np.arange(self.ny)
            return np.cos(np.pi * i / float(self.ny - 1))
        return np.arange(self.ny) * self.dy

    def meshgrid(self):
        return np.meshgrid(self.x(), self.y(), indexing="ij")
