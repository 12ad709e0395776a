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
                 plane_scale: float = 0.007, near_scale: float = 0.0025):
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
        tex_far = plane_texture(rng, self.tex_size)
        tex_near = plane_texture(rng, self.tex_size // 2)
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
