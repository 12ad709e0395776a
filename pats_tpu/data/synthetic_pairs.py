"""Synthetic two-view pairs with exact ground-truth geometry.

Renders a two-depth scene — a textured world plane at Z=0 plus a
smaller occluding patch plane at Z=z_near — viewed from two poses on a
look-at arc.  Every pixel's geometry is analytic (each plane is one
homography warp of its texture), so the pairs carry exact K/T ground
truth for the pose-AUC protocol without any downloaded dataset.  Two
depth layers matter: a single plane is a degenerate configuration for
essential-matrix estimation (the planar two-fold ambiguity), while two
depths make cv2.findEssentialMat well-posed.

The dataset mimics the reference pair-dataset interface
(/root/reference/datasets/scannet.py:12-66 item keys): items are
``{"image0", "image1", "K0", "K1", "T0", "T1"}`` with uint8 HWC images
and 4x4 world-to-camera transforms, so it drops straight into
``pats_tpu.evaluate.evaluate`` (AUC@5/10/20 + breakdown).

Also exports the plane-rendering helpers shared with
tools/make_demo_sequence.py (the demo-ATE sequence renderer).
"""

from __future__ import annotations

import numpy as np


def look_at(center: np.ndarray, target: np.ndarray, up=(0, 1, 0)):
    """World->cam rotation for a camera at ``center`` looking at
    ``target`` (rows are the camera axes)."""
    z = target - center
    z = z / np.linalg.norm(z)
    x = np.cross(np.asarray(up, float), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.stack([x, y, z])


def plane_texture(rng, size: int = 1024):
    """Random texture with low- and mid-frequency detail so matching has
    structure at several scales."""
    import cv2

    base = rng.uniform(0, 255, (size // 16, size // 16, 3)).astype(np.float32)
    img = cv2.resize(base, (size, size), interpolation=cv2.INTER_CUBIC)
    det = rng.uniform(-40, 40, (size // 4, size // 4, 3)).astype(np.float32)
    img += cv2.resize(det, (size, size), interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0, 255).astype(np.uint8)


def plane_texture_blobs(rng, size: int = 1024):
    """Out-of-family texture: piecewise-flat Voronoi-ish cells + hard
    step edges + sparse dots — a very different spectrum (flat regions,
    sharp discontinuities) from ``plane_texture``'s smooth band-limited
    noise.  Used by the cross-family generalization eval (round-3
    verdict #7): the trainers never see this family."""
    import cv2

    img = np.full((size, size, 3), rng.uniform(40, 216, 3), np.float32)
    # large flat polygons (rotated rectangles) with hard edges
    for _ in range(60):
        c = rng.uniform(0, size, 2).astype(np.float32)
        wh = rng.uniform(size // 32, size // 4, 2).astype(np.float32)
        ang = float(rng.uniform(0, 180))
        box = cv2.boxPoints(((float(c[0]), float(c[1])),
                             (float(wh[0]), float(wh[1])), ang))
        cv2.fillConvexPoly(img, box.astype(np.int32),
                           rng.uniform(0, 255, 3).tolist())
    # sparse high-contrast dots
    for _ in range(300):
        p = rng.integers(0, size, 2)
        cv2.circle(img, (int(p[0]), int(p[1])),
                   int(rng.integers(2, size // 64)),
                   rng.uniform(0, 255, 3).tolist(), -1)
    return np.clip(img, 0, 255).astype(np.uint8)


def plane_texture_waves(rng, size: int = 1024):
    """Second out-of-family texture: superposed oriented sinusoidal
    gratings + smooth radial blobs — strongly periodic/anisotropic
    spectrum, unlike both ``plane_texture`` (band-limited noise) and
    ``plane_texture_blobs`` (piecewise-flat + hard edges).  Held OUT of
    the "mixed" training distribution so cross-family generalization
    stays measurable after training diversifies (round-4: training on
    default-only scored auc@5 0.068 on blobs vs 0.501 in-family)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.zeros((size, size, 3), np.float32)
    for _ in range(6):
        ang = rng.uniform(0, np.pi)
        freq = rng.uniform(4, 40)
        phase = rng.uniform(0, 2 * np.pi)
        wave = np.sin(2 * np.pi * freq
                      * (np.cos(ang) * xx + np.sin(ang) * yy) + phase)
        img += wave[..., None] * rng.uniform(10, 45, 3)
    for _ in range(40):
        c = rng.uniform(0, 1, 2)
        r2 = (xx - c[0]) ** 2 + (yy - c[1]) ** 2
        sigma = rng.uniform(0.01, 0.08)
        img += np.exp(-r2 / (2 * sigma * sigma))[..., None] \
            * rng.uniform(-80, 80, 3)
    img += rng.uniform(80, 176, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def plane_texture_mixed(rng, size: int = 1024):
    """Training-diversity sampler: per render, one of the default and
    blobs families (waves stays held out for the cross-family eval)."""
    fam = (plane_texture, plane_texture_blobs)[int(rng.integers(2))]
    return fam(rng, size)


_TEXTURE_FAMILIES = {"default": plane_texture, "blobs": plane_texture_blobs,
                     "waves": plane_texture_waves,
                     "mixed": plane_texture_mixed}


def plane_homography(K: np.ndarray, R: np.ndarray, t: np.ndarray,
                     tex_size: int, plane_scale: float, z: float = 0.0,
                     center_xy=(0.0, 0.0)) -> np.ndarray:
    """Texture-pixel -> image-pixel homography for the plane Z=z.

    World points on the plane are (X, Y, z) with (X, Y) spanning a
    centered square of side ``tex_size * plane_scale`` around
    ``center_xy``; projection is x = K (R [X Y z]^T + t) =
    K [r1 r2 (t + z r3)] [X Y 1]^T.
    """
    S = np.array([[plane_scale, 0, center_xy[0] - plane_scale * tex_size / 2],
                  [0, plane_scale, center_xy[1] - plane_scale * tex_size / 2],
                  [0, 0, 1.0]])
    return K @ np.stack([R[:, 0], R[:, 1], t + z * R[:, 2]], axis=1) @ S


def render_plane(tex: np.ndarray, K: np.ndarray, R: np.ndarray,
                 t: np.ndarray, wh, plane_scale: float, z: float = 0.0,
                 center_xy=(0.0, 0.0), dst=None):
    """warpPerspective the texture onto the view; with ``dst`` given,
    composite over it (the plane occludes whatever is already there)."""
    import cv2

    H = plane_homography(K, R, t, tex.shape[0], plane_scale, z, center_xy)
    warped = cv2.warpPerspective(tex, H, wh, flags=cv2.INTER_LINEAR)
    if dst is None:
        return warped
    mask = cv2.warpPerspective(np.full(tex.shape[:2], 255, np.uint8), H,
                               wh, flags=cv2.INTER_NEAREST)
    out = dst.copy()
    out[mask > 0] = warped[mask > 0]
    return out


class SyntheticPlanePairs:
    """Pair dataset over the two-depth synthetic scene.

    Each item renders one fresh texture pair from two look-at poses:
    camera 0 on a canonical arc position, camera 1 rotated about the
    scene by ``baseline_deg`` degrees (plus height jitter) — guaranteed
    covisibility with a real baseline.  z_near places the occluder
    between the camera (height ~ -4) and the main plane (Z=0).
    """

    def __init__(self, n_pairs: int = 64, width: int = 640,
                 height: int = 480, fx: float = 400.0, seed: int = 0,
                 baseline_deg: float = 12.0, z_near: float = -1.5,
                 plane_scale: float = 0.007, near_scale: float = 0.0025,
                 texture: str = "default"):
        self.texture_fn = _TEXTURE_FAMILIES[texture]
        self.n_pairs = n_pairs
        self.wh = (width, height)
        self.K = np.array([[fx, 0, width / 2], [0, fx, height / 2],
                           [0, 0, 1.0]])
        self.seed = seed
        self.baseline_deg = baseline_deg
        self.z_near = z_near
        self.plane_scale = plane_scale
        self.near_scale = near_scale
        self.tex_size = 1024

    def __len__(self):
        return self.n_pairs

    def poses(self, idx: int):
        """The two (R, t) world->cam poses of pair ``idx``."""
        rng = np.random.default_rng((self.seed, idx))
        target = np.array([0.0, 0.0, 0.0])
        a0 = rng.uniform(-0.5, 0.5)
        a1 = a0 + np.deg2rad(self.baseline_deg) * rng.choice([-1.0, 1.0])
        poses = []
        for a in (a0, a1):
            c = np.array([2.0 * np.sin(a),
                          0.6 * np.cos(a) + rng.uniform(-0.2, 0.2),
                          -4.0 + rng.uniform(-0.3, 0.3)])
            R = look_at(c, target)
            poses.append((R, -R @ c))
        return poses

    def _render(self, tex_far, tex_near, R, t):
        img = render_plane(tex_far, self.K, R, t, self.wh,
                           self.plane_scale, z=0.0)
        return render_plane(tex_near, self.K, R, t, self.wh,
                            self.near_scale, z=self.z_near, dst=img)

    def __getitem__(self, idx: int):
        if idx >= self.n_pairs:
            raise IndexError(idx)
        rng = np.random.default_rng((self.seed, idx, 7))
        tex_far = self.texture_fn(rng, self.tex_size)
        tex_near = self.texture_fn(rng, self.tex_size // 2)
        (R0, t0), (R1, t1) = self.poses(idx)
        T0 = np.eye(4, dtype=np.float32)
        T0[:3, :3], T0[:3, 3] = R0, t0
        T1 = np.eye(4, dtype=np.float32)
        T1[:3, :3], T1[:3, 3] = R1, t1
        return {
            "image0": self._render(tex_far, tex_near, R0, t0),
            "image1": self._render(tex_far, tex_near, R1, t1),
            "K0": self.K.astype(np.float32),
            "K1": self.K.astype(np.float32),
            "T0": T0, "T1": T1,
        }

    def gt_correspondences(self, idx: int, n: int = 120):
        """Exact (kp0, kp1) correspondences in (row, col) px for pair
        ``idx``: world points sampled on BOTH depth layers (non-planar
        set) projected into the two views.  Test/oracle support."""
        rng = np.random.default_rng((self.seed, idx, 13))
        half_far = self.plane_scale * self.tex_size / 2 * 0.4
        half_near = self.near_scale * (self.tex_size // 2) / 2 * 0.8
        pts_far = np.concatenate([
            rng.uniform(-half_far, half_far, (n // 2, 2)),
            np.zeros((n // 2, 1))], axis=1)
        pts_near = np.concatenate([
            rng.uniform(-half_near, half_near, (n - n // 2, 2)),
            np.full((n - n // 2, 1), self.z_near)], axis=1)
        world = np.concatenate([pts_far, pts_near])
        # near-plane points occlude far-plane points behind them: keep
        # far points whose projections fall outside the near patch
        kps = []
        for R, t in self.poses(idx):
            cam = world @ R.T + t
            uv = (cam @ self.K.T)
            uv = uv[:, :2] / uv[:, 2:3]
            kps.append(uv[:, ::-1])            # (row, col)
        kp0, kp1 = kps
        w, h = self.wh
        ok = np.ones(len(world), bool)
        for kp in kps:
            ok &= ((kp[:, 0] >= 0) & (kp[:, 0] < h)
                   & (kp[:, 1] >= 0) & (kp[:, 1] < w))
        # drop far points occluded by the near patch in either view
        for R, t in self.poses(idx):
            Hn = plane_homography(self.K, R, t, self.tex_size // 2,
                                  self.near_scale, self.z_near)
            corners = np.array([[0, 0, 1], [self.tex_size // 2, 0, 1],
                                [self.tex_size // 2, self.tex_size // 2, 1],
                                [0, self.tex_size // 2, 1]], float)
            quad = corners @ Hn.T
            quad = quad[:, :2] / quad[:, 2:3]
            import cv2

            cam = world @ R.T + t
            uv = cam @ self.K.T
            uv = uv[:, :2] / uv[:, 2:3]
            inside = np.array([
                cv2.pointPolygonTest(quad.astype(np.float32), (float(u),
                                                               float(v)),
                                     False) >= 0 for u, v in uv])
            ok &= ~(inside & (world[:, 2] == 0.0))
        return kp0[ok], kp1[ok]


def _in_convex_quad(pts: np.ndarray, quad: np.ndarray) -> np.ndarray:
    """Vectorized point-in-convex-quad test (consistent-side sign)."""
    sign = None
    inside = np.ones(pts.shape[0], bool)
    for i in range(4):
        a, b = quad[i], quad[(i + 1) % 4]
        cross = ((b[0] - a[0]) * (pts[:, 1] - a[1])
                 - (b[1] - a[1]) * (pts[:, 0] - a[0]))
        if sign is None:
            sign = np.sign(cross)
            sign[sign == 0] = 1.0
        inside &= cross * sign >= 0
    return inside


class SyntheticPlaneLabels:
    """Exact per-patch GT labels for a SyntheticPlanePairs item.

    The scene is analytic (two textured planes), so view0->view1
    correspondences of patch centers are exact plane-homography
    transfers with occlusion/coverage handling — the in-domain
    equivalent of the MegaDepth depth-reprojection labels
    (reference datasets/megadepth.py:12-96), feeding the same trainers.

    Label convention (pats_tpu.train.labels):
      [x1, y1, 1.0]  positive (target pixel in view 1)
      [-1e7, ...]    definite negative (target leaves view 1)
      [-1, -1, -1]   unknown (background pixel / occluded in view 1)
    """

    def __init__(self, ds: SyntheticPlanePairs, idx: int):
        (R0, t0), (R1, t1) = ds.poses(idx)
        self.wh = ds.wh
        ts = ds.tex_size
        self.H0f = plane_homography(ds.K, R0, t0, ts, ds.plane_scale, 0.0)
        self.H1f = plane_homography(ds.K, R1, t1, ts, ds.plane_scale, 0.0)
        self.H0n = plane_homography(ds.K, R0, t0, ts // 2, ds.near_scale,
                                    ds.z_near)
        self.H1n = plane_homography(ds.K, R1, t1, ts // 2, ds.near_scale,
                                    ds.z_near)
        corners = np.array([[0, 0, 1], [ts // 2, 0, 1],
                            [ts // 2, ts // 2, 1], [0, ts // 2, 1]], float)
        q0 = corners @ self.H0n.T
        self.near_quad0 = q0[:, :2] / q0[:, 2:3]
        q1 = corners @ self.H1n.T
        self.near_quad1 = q1[:, :2] / q1[:, 2:3]
        self.tex_size = ts

    @staticmethod
    def _apply(H: np.ndarray, pts: np.ndarray) -> np.ndarray:
        p = np.concatenate([pts, np.ones((pts.shape[0], 1))], axis=1) @ H.T
        return p[:, :2] / p[:, 2:3]

    def transfer(self, pts_xy: np.ndarray):
        """(N, 2) view-0 (x, y) px -> (labels (N, 3)) raw-label rows."""
        w, h = self.wh
        on_near = _in_convex_quad(pts_xy, self.near_quad0)
        # texture coordinates on the far plane (image -> texture)
        tex_f = self._apply(np.linalg.inv(self.H0f), pts_xy)
        covered = ((tex_f[:, 0] >= 0) & (tex_f[:, 0] < self.tex_size)
                   & (tex_f[:, 1] >= 0) & (tex_f[:, 1] < self.tex_size))
        x1_far = self._apply(self.H1f @ np.linalg.inv(self.H0f), pts_xy)
        x1_near = self._apply(self.H1n @ np.linalg.inv(self.H0n), pts_xy)
        x1 = np.where(on_near[:, None], x1_near, x1_far)

        label = np.concatenate([x1, np.ones((x1.shape[0], 1))], axis=1)
        # far points hidden behind the near patch in view 1: unknown
        occluded = (~on_near) & _in_convex_quad(x1, self.near_quad1)
        label[occluded] = -1.0
        # background (neither plane covers the view-0 pixel): unknown
        label[~on_near & ~covered] = -1.0
        # projections that leave view 1: definite negative
        off = ((x1[:, 0] < 1) | (x1[:, 0] >= w - 1)
               | (x1[:, 1] < 1) | (x1[:, 1] >= h - 1))
        label[off & ~occluded & (on_near | covered), 0] = -1e7
        return label

    def level_labels(self, patch_size: int) -> np.ndarray:
        """(M, 3) raw labels at patch granularity, row-major patch order
        (same frame as pats_tpu.train.labels.homography_labels)."""
        w, h = self.wh
        ys = (np.arange(h // patch_size) + 0.5) * patch_size
        xs = (np.arange(w // patch_size) + 0.5) * patch_size
        gx, gy = np.meshgrid(xs, ys)
        pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
        return self.transfer(pts)


def plane_pair_example(rng: np.random.Generator, size: int, level: int,
                       baseline_deg: float = 12.0,
                       texture: str = "default", fx_scale: float = 1.0):
    """One training example from a fresh two-depth plane render: left /
    right images + raw labels at the level's granularity (32/8/2 px) —
    the in-domain training source for the synthetic pose-AUC protocol
    (configs/synthetic_trained.yaml).

    ``fx_scale`` > 1 narrows the FOV at a fixed canvas, magnifying the
    apparent texture feature size — scale augmentation without changing
    any array shape.  fx_scale=2.5 on a 256-px canvas reproduces the
    640-px protocol's feature scale (round-5 diagnosis: piecewise-flat
    textures lose all fine-level texture at that zoom when the model
    only ever trained at 1x)."""
    from pats_tpu.train.labels import to_level_labels

    seed = int(rng.integers(0, 2 ** 31 - 1))
    fx = 400.0 * size / 640.0 * fx_scale
    ds = SyntheticPlanePairs(n_pairs=1, width=size, height=size, fx=fx,
                             seed=seed, baseline_deg=baseline_deg,
                             texture=texture)
    ex = ds[0]
    patch = (32, 8, 2)[level]
    raw = SyntheticPlaneLabels(ds, 0).level_labels(patch)
    gt_pos, gt_class = to_level_labels(raw.astype(np.float32), patch)
    return {
        "left": ex["image0"].astype(np.float32),
        "right": ex["image1"].astype(np.float32),
        "gt_pos": gt_pos, "gt_class": gt_class,
        "labels_raw": raw.astype(np.float32),
        "K0": ex["K0"], "K1": ex["K1"], "T0": ex["T0"], "T1": ex["T1"],
    }


def plane_batches(batch_size: int, size: int, level: int = 0,
                  seed: int = 18027, baseline_deg: float = 12.0,
                  texture: str = "default", fx_jitter=None):
    """Endless batches of fresh plane-pair examples (cf.
    train/synthetic.synthetic_batches).  ``fx_jitter=(lo, hi)`` samples a
    per-example ``fx_scale`` uniformly — scale augmentation at constant
    shapes (one executable)."""
    rng = np.random.default_rng(seed)
    while True:
        buf = []
        for _ in range(batch_size):
            fs = float(rng.uniform(*fx_jitter)) if fx_jitter else 1.0
            buf.append(plane_pair_example(rng, size, level, baseline_deg,
                                          texture, fx_scale=fs))
        yield {k: np.stack([b[k] for b in buf]) for k in buf[0]}
