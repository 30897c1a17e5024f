"""Periodic square-lattice geometry: neighbor tables, checkerboard bond
groups, hopping matrices, and momentum grids.

Reference parity: the reference builds nearest-neighbor tables and
checkerboard bond groupings inside its model classes (SURVEY.md §3 rows
"Lattice/neighbors" and "Checkerboard hopping"). Here they are a standalone
module producing static NumPy index tables that get closed over by jitted
sweep programs — geometry never changes during a run, so it must be trace
-time constant for XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class SquareLattice:
    """L x L periodic square lattice with d=2 (the reference's default).

    Site index convention: site = y * L + x  (row-major, x fastest).
    """

    L: int

    @property
    def n_sites(self) -> int:
        return self.L * self.L

    # -- coordinates ------------------------------------------------------
    def xy(self, site: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        return site % self.L, site // self.L

    def site(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return (y % self.L) * self.L + (x % self.L)

    # -- neighbor table ---------------------------------------------------
    def neighbors(self) -> np.ndarray:
        """(N, 4) int array: +x, -x, +y, -y periodic nearest neighbors."""
        s = np.arange(self.n_sites)
        x, y = self.xy(s)
        return np.stack(
            [
                self.site(x + 1, y),
                self.site(x - 1, y),
                self.site(x, y + 1),
                self.site(x, y - 1),
            ],
            axis=1,
        )

    # -- hopping matrix ---------------------------------------------------
    def hopping_matrix(self, t: float = 1.0, tx: float | None = None,
                       ty: float | None = None) -> np.ndarray:
        """Dense tight-binding matrix K with K[i, j] = -t for nn pairs.

        ``tx``/``ty`` allow anisotropic hopping (needed by the SDW model's
        band structure); default isotropic ``t``.
        """
        tx = t if tx is None else tx
        ty = t if ty is None else ty
        N = self.n_sites
        K = np.zeros((N, N))
        s = np.arange(N)
        x, y = self.xy(s)
        K[s, self.site(x + 1, y)] -= tx
        K[s, self.site(x - 1, y)] -= tx
        K[s, self.site(x, y + 1)] -= ty
        K[s, self.site(x, y - 1)] -= ty
        return K

    # -- checkerboard bond groups ----------------------------------------
    def checkerboard_groups(self) -> np.ndarray:
        """Partner tables for the 4 bond groups of the checkerboard breakup.

        Groups: 0 = horizontal bonds starting at even x, 1 = horizontal odd,
        2 = vertical even y, 3 = vertical odd. For even L each group is a
        perfect matching of the lattice, so ``partner[g]`` is an involutive
        permutation: ``partner[g][partner[g][i]] == i``.

        exp(-dtau*K_g) applied to a vector mixes each (i, partner_g[i]) pair
        through a 2x2 [[cosh, sinh], [sinh, cosh]] rotation, so the whole
        group factor is one gather + axpy — the TPU-native replacement for
        the reference's per-plaquette loop (SURVEY.md §3 "Checkerboard").
        """
        if self.L % 2 != 0:
            raise ValueError(
                f"checkerboard breakup requires even L, got L={self.L}"
            )
        N = self.n_sites
        s = np.arange(N)
        x, y = self.xy(s)
        partner = np.zeros((4, N), dtype=np.int32)
        # horizontal: bond (x, x+1); group by parity of x
        right = self.site(x + 1, y)
        left = self.site(x - 1, y)
        partner[0] = np.where(x % 2 == 0, right, left)
        partner[1] = np.where(x % 2 == 1, right, left)
        # vertical: bond (y, y+1); group by parity of y
        up = self.site(x, y + 1)
        down = self.site(x, y - 1)
        partner[2] = np.where(y % 2 == 0, up, down)
        partner[3] = np.where(y % 2 == 1, up, down)
        for g in range(4):
            assert (partner[g][partner[g]] == s).all()
        return partner

    # -- momentum grid ----------------------------------------------------
    def k_grid(self) -> np.ndarray:
        """(N, 2) array of momenta 2*pi*(nx, ny)/L, same ordering as sites."""
        s = np.arange(self.n_sites)
        x, y = self.xy(s)
        return 2.0 * np.pi / self.L * np.stack([x, y], axis=1)

    def fourier_phases(self) -> np.ndarray:
        """(N_k, N_r) matrix exp(-i k.r) for structure factors."""
        k = self.k_grid()
        s = np.arange(self.n_sites)
        x, y = self.xy(s)
        r = np.stack([x, y], axis=1)
        return np.exp(-1j * (k @ r.T))


def kinetic_exponentials(K: np.ndarray, dtau: float, mu: float = 0.0
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Dense exp(-dtau*(K - mu)) and its inverse via eigendecomposition.

    The reference precomputes the dense hopping exponential the same way
    (SURVEY.md §3 "Hubbard model": dense e^{-dtau K} via eigendecomposition);
    both the propagator and its inverse are needed for Green wrapping
    G -> B G B^{-1} without triangular solves (TPU prefers matmuls).
    Computed once at setup in float64 on host, cast to the run dtype.
    """
    w, V = np.linalg.eigh(K)
    expK = (V * np.exp(-dtau * (w - mu))) @ V.T
    expK_inv = (V * np.exp(dtau * (w - mu))) @ V.T
    return expK, expK_inv
