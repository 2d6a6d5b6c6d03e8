"""k-nearest-neighbor mean squared distance (simple-knn replacement).

Behavioral spec: the reference's `distCUDA2(points)` (CUDA submodule
`simple-knn`, call sites /root/reference/scene/gaussian_model.py:389,407):
for each point, the mean of squared distances to its 3 nearest neighbors.
Used once at scene init for auto voxel size and initial log-scales, so this
runs host-side (cKDTree); a chunked JAX brute-force path exists for
device-side use on small N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mean_knn_sq_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """[N,3] → [N] mean squared distance to the k nearest neighbors (host)."""
    from scipy.spatial import cKDTree

    pts = np.asarray(points, dtype=np.float64)
    tree = cKDTree(pts)
    # k+1 because the nearest hit is the point itself
    d, _ = tree.query(pts, k=k + 1, workers=-1)
    return np.mean(d[:, 1:] ** 2, axis=1)


def mean_knn_sq_dist_jax(points: jnp.ndarray, k: int = 3,
                         chunk: int = 1024) -> jnp.ndarray:
    """Brute-force O(N²) JAX version for small N (tests / on-device)."""
    n = points.shape[0]

    def body(i, out):
        q = jax.lax.dynamic_slice_in_dim(points, i * chunk, chunk, 0)
        d2 = jnp.sum((q[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        # exclude self-distance (zero) by taking k+1 smallest
        neg_top, _ = jax.lax.top_k(-d2, k + 1)
        mean_sq = jnp.mean(-neg_top[:, 1:], axis=1)
        return jax.lax.dynamic_update_slice_in_dim(out, mean_sq, i * chunk, 0)

    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = jnp.pad(points, ((0, n_pad - n), (0, 0)), constant_values=1e10)
    out = jnp.zeros((n_pad,), points.dtype)
    out = jax.lax.fori_loop(0, n_pad // chunk, body, out)
    return out[:n]
