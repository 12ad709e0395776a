"""Merge/dedup tests: loop oracles of the literal reference semantics plus
structural invariants.

The oracles implement the algorithms as plain per-slot loops derived from
second_layer.py:137-238 semantics (claimant-centric argmin + reciprocal
scatter for "new"; claimed-centric argmin for "old"), independent of the
vectorized layout pipeline under test.
"""

import numpy as np
import jax.numpy as jnp

from pats_tpu.ops import merge_cells
from pats_tpu.ops.extract import extract_patch_neighborhoods  # noqa: F401


def gate_oracle(trust, cell_alive):
    G = trust.shape[0]
    trust = trust.copy()
    alive = cell_alive.copy()
    px, py = np.meshgrid(np.arange(12), np.arange(12))      # px: col, py: row
    for i in range(3):
        ring = ((px < 3 - i) | (px > 7 + i) | (py < 3 - i) | (py > 7 + i))
        trust[:, ring.reshape(144)] *= 2.0
    alive &= trust <= 2.0
    border = ((px < 1) | (px > 10) | (py < 1) | (py > 10)).reshape(144)
    alive[:, border] = False
    return alive, trust


def to_claimant(x, gh, gw):
    """(G, 144) -> dict[(r, c, k)] claimant-layout loop version."""
    H4, W4 = gh * 4, gw * 4
    out = np.zeros((H4, W4, 9), x.dtype)
    for pr in range(gh):
        for pc in range(gw):
            g = pr * gw + pc
            for da in range(3):
                for i4 in range(4):
                    for db in range(3):
                        for j4 in range(4):
                            cell = (da * 4 + i4) * 12 + db * 4 + j4
                            out[pr * 4 + i4, pc * 4 + j4, da * 3 + db] = x[g, cell]
    return out


def from_claimant(x, gh, gw):
    G = gh * gw
    out = np.zeros((G, 144), x.dtype)
    for pr in range(gh):
        for pc in range(gw):
            g = pr * gw + pc
            for da in range(3):
                for i4 in range(4):
                    for db in range(3):
                        for j4 in range(4):
                            cell = (da * 4 + i4) * 12 + db * 4 + j4
                            out[g, cell] = x[pr * 4 + i4, pc * 4 + j4, da * 3 + db]
    return out


def merge_oracle(trust, patch_alive, cell_alive, gh, gw, new):
    H4, W4 = gh * 4, gw * 4
    alive, trust = gate_oracle(trust, cell_alive)
    alive &= patch_alive[:, None]
    trust = np.where(patch_alive[:, None], trust, 0.0)
    if new:
        trust = np.where(alive, trust - 10000.0, trust)
    claims = to_claimant(trust, gh, gw)
    matching = to_claimant(alive, gh, gw)
    survived = np.zeros((H4, W4, 9), bool)
    for r in range(H4):
        for c in range(W4):
            if new:
                vals = []
                for k in range(9):
                    a, b = k // 3, k % 3
                    tr, tc = r + 4 * (a - 1), c + 4 * (b - 1)
                    v = claims[r, c, k]
                    if not (0 <= tr < H4 and 0 <= tc < W4):
                        v += 100000.0
                    vals.append(v)
                k = int(np.argmin(vals))
                a, b = k // 3, k % 3
                sr, sc = r + 4 * (a - 1), c + 4 * (b - 1)
                if 0 <= sr < H4 and 0 <= sc < W4:
                    win = matching[sr, sc, 8 - k]
                else:
                    win = matching[r, c, k]
                dr, dc = r + 4 * (a - 1), c + 4 * (b - 1)
                if 0 <= dr < H4 and 0 <= dc < W4:
                    survived[dr, dc, 8 - k] = win
            else:
                # claimed-centric: realign then argmin over claims ON (r, c)
                vals, mats = [], []
                for k in range(9):
                    a, b = k // 3, k % 3
                    sr, sc = r - 4 * (a - 1), c - 4 * (b - 1)
                    if 0 <= sr < H4 and 0 <= sc < W4:
                        v, mt = claims[sr, sc, k], matching[sr, sc, k]
                    else:
                        v, mt = claims[r, c, k], matching[r, c, k]
                    if mt:
                        v -= 10000.0
                    vals.append(v)
                    mats.append(mt)
                k = int(np.argmin(vals))
                a, b = k // 3, k % 3
                dr, dc = r - 4 * (a - 1), c - 4 * (b - 1)
                if 0 <= dr < H4 and 0 <= dc < W4:
                    survived[dr, dc, k] = mats[k]
    return from_claimant(survived, gh, gw) & patch_alive[:, None]


def _random_inputs(rng, gh, gw):
    G = gh * gw
    trust = rng.uniform(0.0, 3.0, size=(G, 144)).astype(np.float32)
    patch_alive = rng.uniform(size=G) < 0.7
    cell_alive = rng.uniform(size=(G, 144)) < 0.8
    return trust, patch_alive, cell_alive


def test_merge_new_matches_oracle(rng):
    gh, gw = 3, 4
    trust, pa, ca = _random_inputs(rng, gh, gw)
    got = np.asarray(merge_cells(jnp.asarray(trust), jnp.asarray(pa),
                                 jnp.asarray(ca), gh, gw, new=True))
    want = merge_oracle(trust, pa, ca, gh, gw, new=True)
    np.testing.assert_array_equal(got, want)


def test_merge_old_matches_oracle(rng):
    gh, gw = 3, 4
    trust, pa, ca = _random_inputs(rng, gh, gw)
    got = np.asarray(merge_cells(jnp.asarray(trust), jnp.asarray(pa),
                                 jnp.asarray(ca), gh, gw, new=False))
    want = merge_oracle(trust, pa, ca, gh, gw, new=False)
    np.testing.assert_array_equal(got, want)


def test_merge_old_unique_claims(rng):
    """Old (claimed-centric) merge: every global 8-px cell is claimed by at
    most one surviving (patch, cell) pair."""
    gh, gw = 4, 5
    trust, pa, ca = _random_inputs(rng, gh, gw)
    out = np.asarray(merge_cells(jnp.asarray(trust), jnp.asarray(pa),
                                 jnp.asarray(ca), gh, gw, new=False))
    counts = np.zeros((gh * 4, gw * 4), int)
    for g in range(gh * gw):
        pr, pc = g // gw, g % gw
        for cell in np.nonzero(out[g])[0]:
            i12, j12 = cell // 12, cell % 12
            r = (pr + i12 // 4 - 1) * 4 + i12 % 4
            c = (pc + j12 // 4 - 1) * 4 + j12 % 4
            assert 0 <= r < gh * 4 and 0 <= c < gw * 4
            counts[r, c] += 1
    assert counts.max() <= 1


def test_merge_dead_patches_stay_dead(rng):
    gh, gw = 3, 3
    trust, pa, ca = _random_inputs(rng, gh, gw)
    for new in (True, False):
        out = np.asarray(merge_cells(jnp.asarray(trust), jnp.asarray(pa),
                                     jnp.asarray(ca), gh, gw, new=new))
        assert not out[~pa].any()
