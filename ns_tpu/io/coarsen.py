"""Spatial block-mean coarsening of rollouts.

Capability parity with the reference spatial_coarsen (src/utils.py:13-60):
block-average (T, nx, ny) u/v/p rollouts by agg_x x agg_y and return new
meshgrids on [0, 2]. The reference's inner python double loop becomes one
reshape-mean (vectorized).

Reference quirk (utils.py:51): the j-loop bound reuses agg_x
(`range(ny // agg_x)`), so for agg_x != agg_y the output misses or repeats
columns. Per the repo-wide convention (CLAUDE.md) quirk_compat=True is
the DEFAULT and replicates that; quirk_compat=False fixes it. The quirk
is a no-op when agg_x == agg_y (the reference's only usage), so the
default only bites on rectangular aggregation — exactly where golden
comparisons need the reference behavior.
"""

from __future__ import annotations

import numpy as np


def spatial_coarsen(X, Y, u_seq, v_seq, p_seq, agg_x: int = 4,
                    agg_y: int = 4, quirk_compat: bool = True):
    nx, ny = X.shape[0], X.shape[1]
    T = u_seq.shape[0]
    assert nx % agg_x == 0
    assert ny % agg_y == 0

    out_x = nx // agg_x
    out_y = ny // agg_y

    def block_mean(seq):
        r = seq.reshape(T, out_x, agg_x, out_y, agg_y)
        return r.mean(axis=(2, 4))

    new_u, new_v, new_p = block_mean(u_seq), block_mean(v_seq), block_mean(p_seq)

    if quirk_compat and agg_x != agg_y:
        # replicate the reference's j-range bug: the j-loop bound reuses
        # agg_x (utils.py:50-58). For agg_x > agg_y only the first
        # ny // agg_x columns are written (the rest stay zero); for
        # agg_x < agg_y the reference itself IndexErrors (j*agg_y walks past
        # ny), so there is no reference behavior to replicate — refuse
        # rather than silently return corrected output.
        if agg_x < agg_y:
            raise IndexError(
                "quirk_compat spatial_coarsen with agg_x < agg_y: the "
                "reference raises IndexError here (utils.py:51 j-range bug); "
                "use quirk_compat=False for the corrected block mean")
        j_cap = ny // agg_x
        for arr in (new_u, new_v, new_p):
            if j_cap < out_y:
                arr[:, :, j_cap:] = 0.0

    new_x = np.linspace(0, 2, out_x)
    new_y = np.linspace(0, 2, out_y)
    new_X, new_Y = np.meshgrid(new_x, new_y)
    return new_X, new_Y, new_u, new_v, new_p
