"""Regenerate tests/fixtures/s7_images/* and print the oracle literals.

The s7_image_decode driver query decodes these five files (one per
stdlib-decodable format) and returns (file_name, fmt, width, height,
mean_gray); the DuckDB oracle is a literal VALUES list because no SQL
engine decodes images — decode is deterministic, so the values are
exact, like the blake2b hyperplane literals of ann_lsh_topk. Re-run
this script if the fixtures ever change and paste the printed rows
into __spark_entry__.oracle_sql().
"""

import os

import numpy as np

from ember_spark.functions.codecs import (
    decode_image_gray,
    make_bmp,
    make_gif,
    make_png,
    make_ppm,
    sniff_image_meta,
)
from ember_spark.functions.jpeg import make_jpeg

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "s7_images")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.RandomState(142)
    px = rng.randint(0, 256, (12, 9, 3), np.uint8)
    pal = rng.randint(0, 256, (32, 3), np.uint8)
    files = {
        "img_a.png": make_png(px, filters="mixed"),
        "img_b.gif": make_gif(pal[rng.randint(0, 32, (7, 11))], interlace=True),
        "img_c.ppm": make_ppm(rng.randint(0, 256, (5, 8, 3), np.uint8)),
        "img_d.jpg": make_jpeg(rng.randint(0, 256, (16, 10, 3), np.uint8), quality=1),
        "img_e.bmp": make_bmp(rng.randint(0, 256, (6, 6, 3), np.uint8)),
    }
    rows = []
    for name, data in sorted(files.items()):
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(data)
        w, h, fmt = sniff_image_meta(data)
        g = decode_image_gray(data)
        assert g.shape == (h, w), name
        rows.append((name, fmt, w, h, float(np.mean(g))))
    print("-- paste into oracle_sql()['s7_image_decode']:")
    for name, fmt, w, h, mean in rows:
        # CAST('…' AS DOUBLE), not a ::DOUBLE numeric literal: DuckDB
        # parses long decimal literals as DECIMAL first and loses ulps
        print(
            f"SELECT '{name}' AS file_name, '{fmt}' AS fmt, "
            f"{w}::INT AS width, {h}::INT AS height, "
            f"CAST('{mean!r}' AS DOUBLE) AS mean_gray UNION ALL"
        )


if __name__ == "__main__":
    main()
