"""Write the committed image-fixture files (fixtures/images/) from the
library builders in kenlm_rs_spark.ops.imagegen — real files per the public
PNG/GIF/JPEG/BMP specs, pure stdlib.

Usage: python tools/make_image_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kenlm_rs_spark.ops.imagegen import (
    make_bmp,
    make_gif,
    make_jpeg,
    make_png,
    make_webp_vp8,
    make_webp_vp8l,
    make_webp_vp8x,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures", "images")

FIXTURES = {
    "tiny_rgb.png": make_png(13, 7, color_type=2),
    "tiny_gray.png": make_png(5, 9, color_type=0),
    "tiny_rgba.png": make_png(4, 4, color_type=6),
    "tiny.gif": make_gif(21, 11),
    "tiny.jpg": make_jpeg(31, 17, ncomp=3),
    "tiny_gray.jpg": make_jpeg(8, 6, ncomp=1),
    "tiny.bmp": make_bmp(10, 3),
    "tiny_vp8.webp": make_webp_vp8(24, 18),
    "tiny_vp8l.webp": make_webp_vp8l(15, 9, alpha=True),
    "tiny_vp8x.webp": make_webp_vp8x(640, 480),
}


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, data in FIXTURES.items():
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        print(f"{name}: {len(data)} bytes")


if __name__ == "__main__":
    main()
