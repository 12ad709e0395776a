"""Unit tests for the region-growing transport consumer.

The SAT-based vectorized implementation is checked against a slow,
per-patch Python loop oracle implementing the reference semantics
(utils/utils.py:1179-1297) directly: seeded rectangle growth by max-mass
strips, boundary stops, masked dustbin accumulation, soft-argmax position,
weighted scale and trust costs.
"""

import numpy as np
import jax.numpy as jnp

from pats_tpu.ops import expand_transport, ot_learned_dustbin


def expand_oracle(scores_exp, sx, sy, h, w, iters, lb):
    B, M1, N1 = scores_exp.shape
    M, N = M1 - 1, N1 - 1
    grid = scores_exp[:, :-1, :-1]
    db_col = scores_exp[:, :-1, -1]
    db_row = scores_exp[:, -1, :-1]
    out = {k: np.zeros((B, M)) for k in
           ["whole", "core", "avg_r", "avg_c", "xs", "ys"]}
    out["bound"] = np.zeros((B, M, 4), np.int64)
    out["nomatch"] = np.zeros((B, M), bool)
    for b in range(B):
        for m in range(M):
            g = grid[b, m].reshape(h, w)
            flat = g.reshape(-1)
            seed = int(flat.argmax())
            out["nomatch"][b, m] = (
                np.argmax(scores_exp[b, m, :]) == N)
            r0 = r1 = seed // w
            c0 = c1 = seed % w
            last_sum = flat[seed]
            last_nm = db_row[b, seed]
            dbg = db_row[b].reshape(h, w)
            for _ in range(iters):
                cand = []
                for d in range(4):
                    if d == 0 and r0 > 0:
                        cells = [(r0 - 1, c) for c in range(c0, c1 + 1)]
                    elif d == 1 and r1 < h - 1:
                        cells = [(r1 + 1, c) for c in range(c0, c1 + 1)]
                    elif d == 2 and c0 > 0:
                        cells = [(r, c0 - 1) for r in range(r0, r1 + 1)]
                    elif d == 3 and c1 < w - 1:
                        cells = [(r, c1 + 1) for r in range(r0, r1 + 1)]
                    else:
                        cells = []
                    s = sum(g[r, c] for r, c in cells)
                    nm = sum(dbg[r, c] for r, c in cells if g[r, c] > lb)
                    cand.append((s, nm))
                best = int(np.argmax([s for s, _ in cand]))
                if cand[best][0] > lb:
                    last_sum += cand[best][0]
                    last_nm += cand[best][1]
                    if best == 0:
                        r0 -= 1
                    elif best == 1:
                        r1 += 1
                    elif best == 2:
                        c0 -= 1
                    else:
                        c1 += 1
            # soft-argmax + scale over the final rect
            wsum_x = wsum_c = wsum_y = wsum_r = 0.0
            psum = ssum = 0.0
            for r in range(r0, r1 + 1):
                for c in range(c0, c1 + 1):
                    wx = np.sqrt(g[r, c] + 1e-7) / sx[b, r * w + c]
                    wy = np.sqrt(g[r, c] + 1e-7) / sy[b, r * w + c]
                    wsum_x += wx
                    wsum_c += wx * c
                    wsum_y += wy
                    wsum_r += wy * r
                    scale_cell = sx[b, r * w + c] * sy[b, r * w + c]
                    psum += (g[r, c] + 1e-7) / scale_cell
                    ssum += g[r, c] + 1e-7
            out["avg_c"][b, m] = wsum_c / wsum_x + 0.5
            out["avg_r"][b, m] = wsum_r / wsum_y + 0.5
            avg_scale = np.sqrt(ssum / psum)
            out["xs"][b, m] = 1.0 / avg_scale
            out["ys"][b, m] = 1.0 / avg_scale
            # trust costs
            the_scale = grid[b, m].sum() + db_col[b, m]
            out["whole"][b, m] = 0.0 if out["nomatch"][b, m] else (
                abs(the_scale - last_sum) + last_nm / 4.0) / the_scale
            perim_s = (g[r0, c0:c1 + 1].sum() + g[r1, c0:c1 + 1].sum()
                       + g[r0:r1 + 1, c0].sum() + g[r0:r1 + 1, c1].sum())
            corner_s = g[r0, c0] + g[r0, c1] + g[r1, c0] + g[r1, c1]
            sgrid = (sx[b] * sy[b]).reshape(h, w)
            perim_sc = (sgrid[r0, c0:c1 + 1].sum() + sgrid[r1, c0:c1 + 1].sum()
                        + sgrid[r0:r1 + 1, c0].sum() + sgrid[r0:r1 + 1, c1].sum())
            corner_sc = (sgrid[r0, c0] + sgrid[r0, c1]
                         + sgrid[r1, c0] + sgrid[r1, c1])
            core = (r1 - r0 > 1) and (c1 - c0 > 1)
            if core and not out["nomatch"][b, m]:
                core_sum = last_sum - perim_s + corner_s
                core_sc = the_scale - perim_sc + corner_sc
                out["core"][b, m] = abs((core_sum - core_sc) / the_scale)
            out["bound"][b, m] = [r0, r1, c0, c1]
    return out


def _make_plan(rng, b, h, w, peaked=True):
    """Build a realistic exp transport plan via the actual level-1 OT."""
    n = h * w
    scores = rng.normal(size=(b, n, n)).astype(np.float32)
    if peaked:
        # plant diagonal-ish structure so rectangles actually grow
        for i in range(n):
            scores[:, i, i] += 4.0
            if i + 1 < n:
                scores[:, i, i + 1] += 2.0
    ns = rng.uniform(0.3, 2.5, size=(b, n)).astype(np.float32)
    Z = ot_learned_dustbin(jnp.asarray(0.3 * scores), 1.0, jnp.asarray(ns), 60)
    return np.exp(np.asarray(Z, np.float64))


def test_expand_matches_oracle(rng):
    b, h, w = 2, 5, 6
    plan = _make_plan(rng, b, h, w)
    sx = rng.uniform(0.5, 2.0, size=(b, h * w)).astype(np.float64)
    sy = rng.uniform(0.5, 2.0, size=(b, h * w)).astype(np.float64)

    res = expand_transport(jnp.asarray(plan, jnp.float32),
                           jnp.asarray(sx, jnp.float32),
                           jnp.asarray(sy, jnp.float32),
                           h, w, iter_num=8, lower_bound=1e-3)
    want = expand_oracle(plan, sx, sy, h, w, 8, 1e-3)

    np.testing.assert_array_equal(np.asarray(res.if_nomatching),
                                  want["nomatch"])
    np.testing.assert_array_equal(np.asarray(res.bound), want["bound"])
    np.testing.assert_allclose(np.asarray(res.average_point[..., 0]),
                               want["avg_r"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.average_point[..., 1]),
                               want["avg_c"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.x_scale), want["xs"],
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.whole_cost), want["whole"],
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.core_cost), want["core"],
                               rtol=2e-3, atol=1e-4)


def test_expand_level1_sizes(rng):
    """Smoke test at realistic level-1 size (640x480 -> 15x20 grid)."""
    b, h, w = 1, 15, 20
    plan = _make_plan(rng, b, h, w)
    sx = rng.uniform(0.25, 4.0, size=(b, h * w)).astype(np.float32)
    res = expand_transport(jnp.asarray(plan, jnp.float32), jnp.asarray(sx),
                           jnp.asarray(sx), h, w, 15, 1e-5)
    assert res.average_point.shape == (1, h * w, 2)
    pts = np.asarray(res.average_point)
    assert np.all(np.isfinite(pts))
    assert np.all(pts[..., 0] >= 0) and np.all(pts[..., 0] <= h)
    assert np.all(pts[..., 1] >= 0) and np.all(pts[..., 1] <= w)


def test_expand_pallas_loop_matches(rng):
    """The Pallas growth-loop kernel (interpret mode) must reproduce the
    XLA loop exactly."""
    b, h, w = 2, 5, 6
    plan = _make_plan(rng, b, h, w)
    sx = rng.uniform(0.5, 2.0, size=(b, h * w)).astype(np.float32)
    ref = expand_transport(jnp.asarray(plan, jnp.float32), jnp.asarray(sx),
                           jnp.asarray(sx), h, w, 8, 1e-3)
    got = expand_transport(jnp.asarray(plan, jnp.float32), jnp.asarray(sx),
                           jnp.asarray(sx), h, w, 8, 1e-3,
                           use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.bound),
                                  np.asarray(ref.bound))
    np.testing.assert_allclose(np.asarray(got.whole_cost),
                               np.asarray(ref.whole_cost), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.average_point),
                               np.asarray(ref.average_point), rtol=1e-5)
