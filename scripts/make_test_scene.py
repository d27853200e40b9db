"""Generate a deterministic, structured test scene for parity checks.

The depth model needs an in-distribution-ish photo (ground plane, sky,
occluding objects, perspective cues) for its FOV head to produce a sane
focal estimate; random-noise images yield degenerate FOVs that saturate
the inverse-depth clamp and make error metrics meaningless. No network
access is assumed, so the scene is procedural: sky gradient + sun, a
perspective-textured ground plane, and shaded boxes at varying distances.

Usage: python scripts/make_test_scene.py [out.jpg [WxH]]
"""

from __future__ import annotations

import sys

import numpy as np


def make_scene(w: int = 4032, h: int = 3024) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    u, v = xx / w, yy / h
    img = np.zeros((h, w, 3), np.float32)

    horizon = 0.45
    sky = v < horizon
    t = (v / horizon).clip(0, 1)
    img[..., 0] = np.where(sky, 0.35 + 0.35 * t, 0)
    img[..., 1] = np.where(sky, 0.55 + 0.25 * t, 0)
    img[..., 2] = np.where(sky, 0.95 - 0.15 * t, 0)

    # sun
    d2 = (u - 0.75) ** 2 + (v - 0.15) ** 2
    img += np.where(sky, np.exp(-d2 * 800), 0)[..., None] * np.array([1.0, 0.9, 0.6])

    # ground: perspective checker fading to haze at the horizon
    g = ~sky
    depth = 1.0 / np.maximum(v - horizon, 1e-3)  # pseudo scene depth
    chk = (np.floor(8 * (u - 0.5) * depth) + np.floor(0.6 * depth)) % 2
    ground = 0.25 + 0.18 * chk
    haze = np.exp(-0.04 * depth)
    for c, base in enumerate((0.45, 0.40, 0.32)):
        img[..., c] = np.where(g, base * ground * (1 - haze) + 0.7 * haze, img[..., c])

    # boxes (buildings) at varying distances: nearer = bigger, darker base
    rng = np.random.RandomState(7)
    for i in range(7):
        bw = 0.05 + 0.05 * rng.rand()
        x0 = 0.08 + 0.12 * i + 0.03 * rng.rand()
        top = horizon - (0.05 + 0.28 * rng.rand())
        shade = 0.25 + 0.5 * rng.rand()
        col = np.array([shade, shade * (0.8 + 0.3 * rng.rand()), shade * 0.8])
        box = (u > x0) & (u < x0 + bw) & (v > top) & (v < horizon + 0.15 * (1 - i / 8))
        img[box] = col + 0.08 * np.sin(120 * u[box])[..., None]  # window texture

    return (img.clip(0, 1) * 255).astype(np.uint8)


if __name__ == "__main__":
    from PIL import Image

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scene.jpg"
    if len(sys.argv) > 2:
        w, h = map(int, sys.argv[2].split("x"))
    else:
        w, h = 4032, 3024
    Image.fromarray(make_scene(w, h)).save(out, quality=92)
    print(out)
