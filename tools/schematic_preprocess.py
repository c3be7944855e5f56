#!/usr/bin/env python3
"""Schematic image preprocessing for vision-model reading.

Rebuild of the reference tools/schematic_preprocess.py (not
runtime-relevant): crop a region of a large schematic scan and enhance it
(CLAHE-style local contrast + unsharp masking) so a vision model can read
component values. Image I/O via matplotlib (no cv2/PIL in this image);
grayscale processing in NumPy.

    python tools/schematic_preprocess.py scan.png --crop 0.2,0.1,0.6,0.5 \
        --out crop.png
"""

import argparse

import matplotlib

matplotlib.use("Agg")
import matplotlib.image as mpimg
import matplotlib.pyplot as plt
import numpy as np


def to_gray(img):
    if img.ndim == 3:
        return img[..., :3] @ np.array([0.299, 0.587, 0.114])
    return img.astype(np.float64)


def clahe(gray, tiles=8, clip=0.01, bins=256):
    """Contrast-limited adaptive histogram equalisation (tile-wise, with
    bilinear blending between tile mappings)."""
    h, w = gray.shape
    th, tw = max(h // tiles, 1), max(w // tiles, 1)
    gray = np.clip(gray, 0.0, 1.0)
    # Per-tile clipped CDF lookup tables
    ny, nx = (h + th - 1) // th, (w + tw - 1) // tw
    luts = np.zeros((ny, nx, bins))
    for i in range(ny):
        for j in range(nx):
            tile = gray[i * th:(i + 1) * th, j * tw:(j + 1) * tw]
            hist, _ = np.histogram(tile, bins=bins, range=(0.0, 1.0))
            hist = hist.astype(np.float64) / max(tile.size, 1)
            excess = np.maximum(hist - clip, 0.0).sum()
            hist = np.minimum(hist, clip) + excess / bins
            luts[i, j] = np.cumsum(hist)
    # Bilinear interpolation of tile mappings per pixel
    ys = np.clip((np.arange(h) - th / 2) / th, 0, ny - 1)
    xs = np.clip((np.arange(w) - tw / 2) / tw, 0, nx - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, ny - 1)
    x1 = np.minimum(x0 + 1, nx - 1)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    idx = np.clip((gray * (bins - 1)).astype(int), 0, bins - 1)
    out = np.zeros_like(gray)
    for (yy, wy) in ((y0, 1 - fy), (y1, fy)):
        for (xx, wx) in ((x0, 1 - fx), (x1, fx)):
            out += wy * wx * luts[yy[:, None], xx[None, :], idx]
    return np.clip(out, 0.0, 1.0)


def unsharp(gray, radius=2, amount=1.0):
    """Unsharp mask via separable box blur."""
    k = 2 * radius + 1
    kernel = np.ones(k) / k
    blurred = np.apply_along_axis(
        lambda r: np.convolve(r, kernel, mode="same"), 1, gray)
    blurred = np.apply_along_axis(
        lambda c: np.convolve(c, kernel, mode="same"), 0, blurred)
    return np.clip(gray + amount * (gray - blurred), 0.0, 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("input")
    p.add_argument("--crop", default="0,0,1,1",
                   help="x0,y0,x1,y1 as fractions of width/height")
    p.add_argument("--tiles", type=int, default=8)
    p.add_argument("--clip", type=float, default=0.01)
    p.add_argument("--sharpen", type=float, default=1.0)
    p.add_argument("--out", default="/tmp/schematic_crop.png")
    args = p.parse_args()

    img = mpimg.imread(args.input)
    gray = to_gray(img)
    if gray.max() > 1.0:
        gray = gray / 255.0

    x0, y0, x1, y1 = [float(v) for v in args.crop.split(",")]
    h, w = gray.shape
    gray = gray[int(y0 * h):int(y1 * h), int(x0 * w):int(x1 * w)]
    print(f"crop: {gray.shape[1]}x{gray.shape[0]} px")

    gray = clahe(gray, tiles=args.tiles, clip=args.clip)
    gray = unsharp(gray, amount=args.sharpen)

    plt.imsave(args.out, gray, cmap="gray", vmin=0.0, vmax=1.0)
    print(f"→ {args.out}")


if __name__ == "__main__":
    main()
