"""2D affine transforms as 6-vectors [a, b, c, d, e, f]:
x' = a*x + b*y + c ; y' = d*x + e*y + f.

Rebuild of the reference's Transform2D (reference: internal/star/coord.go).
"""

from __future__ import annotations

import numpy as np


def identity() -> np.ndarray:
    """Identity transform (coord.go:111-113)."""
    return np.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0], np.float32)


def from_three_points(p1, p2, p3, p1p, p2p, p3p) -> np.ndarray:
    """Affine transform mapping three points to three reference points,
    closed form (coord.go:118-137). Raises ZeroDivisionError-like ValueError
    on degenerate (collinear) input."""
    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)
    p3 = np.asarray(p3, np.float64)
    p1p = np.asarray(p1p, np.float64)
    p2p = np.asarray(p2p, np.float64)
    p3p = np.asarray(p3p, np.float64)

    denom = (p2[1] - p1[1]) * (p3[0] - p1[0]) - (p2[0] - p1[0]) * (p3[1] - p1[1])
    with np.errstate(divide="ignore", invalid="ignore"):
        a = ((p3p[0] - p1p[0]) * (p2[1] - p1[1]) - (p2p[0] - p1p[0]) * (p3[1] - p1[1])) / denom
        b = ((p2p[0] - p1p[0]) - a * (p2[0] - p1[0])) / (p2[1] - p1[1])
        c = p1p[0] - a * p1[0] - b * p1[1]
        d = ((p3p[1] - p1p[1]) * (p2[1] - p1[1]) - (p2p[1] - p1p[1]) * (p3[1] - p1[1])) / denom
        e = ((p2p[1] - p1p[1]) - d * (p2[0] - p1[0])) / (p2[1] - p1[1])
        f = p1p[1] - d * p1[0] - e * p1[1]
    t = np.array([a, b, c, d, e, f], np.float64)
    if not np.isfinite(t).all():
        raise ValueError("divide by zero in transform construction")
    return t.astype(np.float32)


def apply(t: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply transform to (..., 2) points (coord.go:141-145)."""
    x, y = pts[..., 0], pts[..., 1]
    return np.stack([t[0] * x + t[1] * y + t[2], t[3] * x + t[4] * y + t[5]], axis=-1)


def invert(t: np.ndarray) -> np.ndarray:
    """Closed-form inverse (coord.go:159-201). Raises on singular."""
    a, b, c, d, e, f = (float(v) for v in t)
    eps = b * d - a * e
    if abs(eps) < 1e-8:
        raise ValueError(f"Matrix has no inverse, epsilon={eps:g}")
    return np.array(
        [
            -e / eps, b / eps, (c * e - b * f) / eps,
            -d / (a * e - b * d), a / (a * e - b * d), (c * d - a * f) / (a * e - b * d),
        ],
        np.float32,
    )


def to_string(t) -> str:
    """Log formatting matching coord.go:73-76."""
    a, b, c, d, e, f = (float(v) for v in t)
    return f"x'={a:.5f}x {b:+.5f}y {c:+.2f}, y'={d:.5f}x {e:+.5f}y {f:+.2f}"
