"""Reference-compatible npz rollout interchange.

The reference's solvers dump rollouts as np.savez with keys u, v, p,
each (nt, nx, ny) (direct_fd/simulate.py:194, chorin_fd/simulate.py:324,
chorin_spectral/simulate.py:621), and the training scripts load them back
by those keys (spectral_ode.py:158-159). Canonical dataset paths mirror the
reference constants (src/constants.py:1-5).
"""

from __future__ import annotations

import os

import numpy as np

# canonical file names (ref src/constants.py:4-5)
CHORIN_FD_DATA_FILE = "data_semi_implicit.npz"
DIRECT_FD_DATA_FILE = "data.npz"


def save_rollout(path: str, u, v, p) -> str:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    np.savez(path, u=np.asarray(u), v=np.asarray(v), p=np.asarray(p))
    return path


def load_rollout(path: str):
    data = np.load(path)
    return data["u"], data["v"], data["p"]
