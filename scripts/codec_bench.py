"""Measure the multimodal decode throughput through the REAL Spark
path (binary column -> extract_image_features / extract_video_features
Arrow UDFs) and write the numbers into BENCH.md between the
`<!-- codecs:begin/end -->` markers.

The corpora are synthetic but the decode work is real: every payload
is a spec-valid PNG / baseline JPEG / GIF / MJPEG-AVI produced by the
independent test encoders in functions/codecs.py + functions/jpeg.py.
Throughput here is the PYTHON-side codec cost the `use_pil` opt-in
exists to beat for jpeg-heavy corpora — publishing it keeps that
trade-off a measured claim instead of an assertion.
"""

import os
import re
import time

import numpy as np

from ember_spark.functions.codecs import make_avi_mjpeg, make_gif, make_png
from ember_spark.functions.jpeg import make_jpeg
from ember_spark.operators.multimodal import (
    extract_image_features,
    extract_video_features,
)
from ember_spark.session import get_spark

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
N_IMG = int(os.environ.get("CODEC_BENCH_IMAGES", "4000"))
SIDE = int(os.environ.get("CODEC_BENCH_SIDE", "64"))
N_VID = int(os.environ.get("CODEC_BENCH_VIDEOS", "200"))
FRAMES = 12


def bench(df, col, fn, n_units):
    t0 = time.monotonic()
    out = fn(df)
    # count() alone could prune the feature column; aggregate over it
    from pyspark.sql import functions as F

    out.agg(F.count(col)).collect()
    dt = time.monotonic() - t0
    return n_units / dt, dt


def main() -> None:
    spark = get_spark("codec_bench")
    sc = spark.sparkContext
    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, (SIDE, SIDE), np.uint8)
    pal = rng.randint(0, 256, (64, 3), np.uint8)

    def variant(i, maker):
        px = ((base.astype(np.int32) + i) % 256).astype(np.uint8)
        return maker(px)

    rows_png = [
        (i, bytearray(variant(i, lambda p: make_png(p, filters="none"))))
        for i in range(N_IMG)
    ]
    rows_jpg = [
        (i, bytearray(variant(i, lambda p: make_jpeg(p, quality=5))))
        for i in range(N_IMG)
    ]
    rows_gif = [
        (i, bytearray(make_gif(pal[(rng.randint(0, 64, (SIDE, SIDE)))])))
        for i in range(N_IMG // 4)
    ]
    frames = [make_jpeg(base, quality=5) for _ in range(FRAMES)]
    rows_avi = [(i, bytearray(make_avi_mjpeg(frames))) for i in range(N_VID)]

    results = {}
    for name, rows, col, fn, units in [
        ("png_images_per_s", rows_png, "img_features",
         lambda d: extract_image_features(d, dim=32), N_IMG),
        ("jpeg_images_per_s", rows_jpg, "img_features",
         lambda d: extract_image_features(d, dim=32), N_IMG),
        ("gif_images_per_s", rows_gif, "img_features",
         lambda d: extract_image_features(d, dim=32), len(rows_gif)),
        ("avi_videos_per_s", rows_avi, "video_features",
         lambda d: extract_video_features(d, dim=32, every_k=2), N_VID),
    ]:
        df = spark.createDataFrame(rows, "id long, content binary").repartition(
            sc.defaultParallelism
        )
        # warm (JVM + worker pool), then measure best of 2
        rates = []
        for _ in range(2):
            rate, dt = bench(df, col, fn, units)
            rates.append(rate)
        results[name] = max(rates)
        print(name, f"{max(rates):,.0f}")

    block = (
        "<!-- codecs:begin -->\n"
        "### Multimodal decode throughput (pure-Python codecs through the Spark Arrow path)\n\n"
        f"{N_IMG:,} synthetic {SIDE}x{SIDE} png/jpeg images, {N_IMG // 4:,} "
        f"gifs, and {N_VID} {FRAMES}-frame MJPEG-AVI videos (every_k=2) through "
        "`extract_image_features` / `extract_video_features` on this "
        "session's local profile, best of 2:\n\n"
        "| payload | decode throughput |\n|---|---|\n"
        f"| PNG {SIDE}x{SIDE} gray | {results['png_images_per_s']:,.0f} images/s |\n"
        f"| baseline JPEG {SIDE}x{SIDE} | {results['jpeg_images_per_s']:,.0f} images/s |\n"
        f"| GIF {SIDE}x{SIDE} (LZW) | {results['gif_images_per_s']:,.0f} images/s |\n"
        f"| MJPEG-AVI ({FRAMES} frames, pool 6) | {results['avi_videos_per_s']:,.0f} videos/s |\n\n"
        "The jpeg/gif rows are per-coefficient / per-code Python loops — "
        "correct, deterministic, and the reason `use_pil` remains the "
        "documented fast path for jpeg-heavy corpora; png/ppm/bmp rows are "
        "numpy-vectorized. Scale path: decode parallelizes embarrassingly "
        "across executors (one payload per row, no shuffle).\n"
        "<!-- codecs:end -->"
    )
    bench_md = os.path.join(ROOT, "BENCH.md")
    s = open(bench_md).read()
    if "<!-- codecs:begin -->" in s:
        s = re.sub(
            r"<!-- codecs:begin -->.*?<!-- codecs:end -->", block, s, flags=re.S
        )
    else:
        s = s.rstrip() + "\n\n" + block + "\n"
    open(bench_md, "w").write(s)
    print("BENCH.md updated")


if __name__ == "__main__":
    main()
