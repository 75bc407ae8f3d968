"""Synthetic-motion evaluation: ground-truthed stereo sequences, no KITTI.

The reference validates only against KITTI bags it cannot ship (SURVEY.md §4);
this module renders exact stereo sequences with known motion so accuracy is
testable hermetically:

  * scene = textured plane (z = depth in the frame-0 camera), so every view —
    both stereo eyes, every frame — is an exact homography warp of one
    texture (sub-pixel consistent, no splatting artefacts);
  * trajectories: straight, curved (yaw rate), or a custom list of per-frame
    twists;
  * returns ground-truth world_T_cam poses for ATE/RPE/KITTI-metric scoring
    via `eval.metrics`.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_P_L = np.array([[718.856, 0, 607.1928, 0.0],
                        [0, 718.856, 185.2157, 0.0],
                        [0, 0, 1.0, 0.0]], np.float64)
DEFAULT_BASELINE_FX = -386.1448  # P_r[0, 3] (KITTI gray pair)


def _rotvec_to_matrix(r):
    from scipy.spatial.transform import Rotation
    return Rotation.from_rotvec(r).as_matrix()


def blob_texture(rng: np.random.Generator, th: int = 1000, tw: int = 3000,
                 blob_sigma: float = 6.0) -> np.ndarray:
    """High-contrast random blob texture whose corners survive downscaling."""
    import cv2
    noise = cv2.GaussianBlur(rng.random((th, tw)).astype(np.float32),
                             (0, 0), blob_sigma)
    tex = (noise > np.median(noise)).astype(np.uint8) * 200 + 30
    return cv2.GaussianBlur(tex, (0, 0), 1.0)


def synthetic_drive(rng: np.random.Generator, n_frames: int = 10,
                    h: int = 375, w: int = 1242, depth: float = 8.0,
                    forward_per_frame: float = 0.35,
                    yaw_rate: float = 0.0,
                    twists: Optional[Sequence[np.ndarray]] = None,
                    P_l: Optional[np.ndarray] = None,
                    baseline_fx: float = DEFAULT_BASELINE_FX
                    ) -> Tuple[List[Tuple[np.ndarray, np.ndarray]],
                               List[np.ndarray], np.ndarray, np.ndarray]:
    """Render a stereo sequence over a textured plane.

    Returns (frames [(img_l, img_r) uint8], gt_poses [world_T_cam 4x4],
    P_l 3x4, P_r 3x4). `twists` overrides the built-in motion: a list of
    (rotvec(3), translation(3)) pairs applied per frame.

    The scene is a fronto-parallel textured plane at `depth` metres: the
    drive is only valid while the camera stays in FRONT of it (total
    forward travel < depth). Scale `depth` with the drive length for
    long-horizon sequences (a RuntimeWarning fires past 90% of the budget
    and the rendered geometry degenerates into mirror projections beyond
    it — estimators then rightly lose track)."""
    import cv2
    P_l = DEFAULT_P_L.copy() if P_l is None else np.asarray(P_l, np.float64)
    P_r = P_l.copy()
    P_r[0, 3] = baseline_fx

    # texture plane parameterisation: X(u, v) = M @ [u, v, 1]
    tw_, th_ = 3000, 1000
    extent_x, extent_y = 5.0 * depth, 1.75 * depth
    M = np.array([[extent_x / tw_, 0.0, -extent_x / 2],
                  [0.0, extent_y / th_, -extent_y / 2],
                  [0.0, 0.0, depth]])
    tex = blob_texture(rng, th_, tw_)

    frames: List[Tuple[np.ndarray, np.ndarray]] = []
    poses: List[np.ndarray] = []
    T = np.eye(4)
    for i in range(n_frames):
        if i > 0:
            dT = np.eye(4)
            if twists is not None:
                rot, trans = twists[i - 1]
                dT[:3, :3] = _rotvec_to_matrix(np.asarray(rot))
                dT[:3, 3] = np.asarray(trans)
            else:
                dT[:3, :3] = _rotvec_to_matrix([0.0, yaw_rate, 0.0])
                dT[:3, 3] = [0.0, 0.0, forward_per_frame]
            T = T @ dT
        poses.append(T.copy())
        if T[2, 3] > 0.9 * depth:
            import warnings
            warnings.warn(
                f"synthetic_drive: frame {i} is {T[2, 3]:.1f} m forward of "
                f"a plane at depth={depth} m — geometry degenerates at the "
                "plane; pass a larger `depth` for this drive length",
                RuntimeWarning, stacklevel=2)
        Tinv = np.linalg.inv(T)

        def render(P):
            P_i = P @ Tinv
            H = P_i[:, :3] @ M + np.outer(P_i[:, 3], [0.0, 0.0, 1.0])
            return cv2.warpPerspective(tex, H, (w, h),
                                       flags=cv2.INTER_LINEAR)

        frames.append((render(P_l), render(P_r)))
    return frames, poses, P_l, P_r


def score_trajectory(est_poses: Sequence[np.ndarray],
                     gt_poses: Sequence[np.ndarray]) -> dict:
    """ATE + RPE + final-position drift, the hermetic accuracy report."""
    from spsvo_tpu.eval import metrics
    n = min(len(est_poses), len(gt_poses))
    est, gt = list(est_poses)[:n], list(gt_poses)[:n]
    total = float(np.linalg.norm(gt[-1][:3, 3] - gt[0][:3, 3]))
    final_err = float(np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3]))
    out = {
        "ate_m": metrics.ate(gt, est),
        "final_drift_m": final_err,
        "final_drift_percent": 100.0 * final_err / max(total, 1e-9),
        "path_length_m": total,
    }
    out.update(metrics.rpe(gt, est))
    return out
