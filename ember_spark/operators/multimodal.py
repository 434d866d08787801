"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (SURVEY.md §2.8 M5/M6 vision path; reference twin-tower ViT
`vision_matcher.py:33-58`, gated-sum fusion `gatedsum.py:13-20`).

Decode strategy (VERDICT r2 #9): decode is REAL wherever a codec
exists without external libs — `functions/codecs.py` decodes PPM/PGM,
uncompressed BMP, PNG (zlib + hand unfilter), baseline JPEG (pure-
numpy Huffman + IDCT, functions/jpeg.py) and PCM WAV via stdlib
`wave`, and sniffs width/height/format from PNG/JPEG/GIF/BMP/PPM
headers with no pixel decode at all. The `use_pil` opt-in remains the
fast path for jpeg-heavy corpora (libjpeg beats a Python Huffman
loop). Only formats with neither path fall back to the
clearly-marked stub: NotImplementedError by default, or a
blake2b-seeded deterministic fake with `allow_fake=True` so the
Spark-side plumbing (schema, Arrow batch shape, partitioning) stays
testable either way.

Fusion (the parts that need no codec and are REAL here):
- `image_pair_features` — the M5 twin-tower fusion surface: cosine,
  L2-diff norm and Hadamard-mean of two feature vectors, computed in
  one Arrow pass (numpy, batch-vectorized).
- `gated_sum_udf` — M6: sigma(w.[a;b]+b)*a + (1-sigma)*b, a learned
  soft switch between two modality vectors, same math as the
  reference's GatedSum on concatenated features.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, FloatType

# module-level so UDF hot loops don't pay a per-row import (the module
# re-imports once per worker process when the closure unpickles)
from ember_spark.functions.codecs import block_mean_resize, decode_image_gray

IMAGE_META_SCHEMA = "width int, height int, format string"


def have_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def image_feature_extractor(
    dim: int = 32,
    allow_fake: bool = False,
    deterministic_fake: bool | None = None,
    use_pil: bool = False,
):
    """binary -> float feature vector, as an Arrow-batched pandas UDF.

    Formats the stdlib decoder covers (ppm/pgm/bmp/png) are decoded,
    resized to a sqrt(dim) x sqrt(dim) grayscale grid, mean-centered and
    L2-normalized — a real (if simple) perceptual embedding,
    deterministic across runs. Other formats: NotImplementedError unless
    `allow_fake`, which substitutes a blake2b-seeded fake that is a pure
    function of the bytes, so tests exercise batching, schema and
    determinism.

    `use_pil=True` is an EXPLICIT opt-in (like zh_tokenizer='jieba',
    tokenize.py): jpeg etc. decode via PIL on the executors, and an
    executor without PIL fails the stage loudly (ImportError) instead of
    silently taking the fake/stub path — per-row behavior must never
    vary with the worker environment (import-detection would decode a
    payload on workers that have PIL and raise on workers that don't).

    `deterministic_fake` is the old name for `allow_fake` (kept for
    compatibility).
    """
    if deterministic_fake is not None:
        allow_fake = deterministic_fake
    side = max(int(round(dim ** 0.5)), 1)

    @F.pandas_udf(ArrayType(FloatType()))
    def _extract(content: pd.Series) -> pd.Series:
        pil_image = _require_pil() if use_pil else None
        out = []
        for b in content:
            if b is None:
                out.append([0.0] * dim)
                continue
            out.append(_blob_feature(bytes(b), dim, side, allow_fake, pil_image))
        return pd.Series(out)

    return _extract


def _require_pil():
    # opt-in resolved once per batch: a worker lacking PIL raises here
    # and fails the stage — uniform behavior, never a per-worker branch
    from PIL import Image

    return Image


def _blob_feature(
    raw: bytes, dim: int, side: int, allow_fake: bool, pil_image,
    strict: bool = False,
) -> list[float]:
    """One payload -> normalized feature list (the shared kernel of the
    image UDF and the video frame-pooling UDF).

    `strict=True` (the video frame-pooling caller): a payload that FAILS
    to decode raises instead of returning the zero vector, so the caller
    can SKIP the frame — a zero vector averaged into a frame pool would
    silently dilute the video feature toward zero, while the image UDF's
    per-row contract (corrupt payload -> zeros) stays the default. A
    frame that legitimately decodes to uniform gray still returns zeros
    (v - mean == 0) and still pools — only decode FAILURES differ."""
    v = None
    # 1) with the use_pil opt-in, PIL decodes FIRST: it is the
    #    libjpeg-speed path the user explicitly asked for. NOTE:
    #    use_pil=True feature vectors CHANGED at the round-5 commit
    #    that introduced this ordering — releases in between ran the
    #    stdlib decoder first for the formats it covers (PIL resize vs
    #    block_mean_resize differ numerically), so use_pil=True corpora
    #    embedded with those releases must be re-embedded to compare.
    #    use_pil=False vectors are unaffected.
    if pil_image is not None:
        try:
            import io

            img = pil_image.open(io.BytesIO(raw)).convert("L")
            v = np.asarray(img.resize((side, side)), dtype=np.float64).ravel()[:dim]
            v = np.pad(v, (0, dim - len(v)))
            v = v - v.mean()
        except Exception:
            v = None  # fall through to the stdlib decoders
    pil_failed = pil_image is not None and v is None
    # 2) stdlib/numpy decode: ppm/pgm/bmp/png/baseline-jpeg/gif
    if v is None:
        try:
            g = decode_image_gray(raw)
            v = block_mean_resize(g, side).ravel()[:dim]
            v = np.pad(v, (0, dim - len(v)))
            v = v - v.mean()
        except NotImplementedError:
            pass
        except Exception:
            if strict:
                raise
            return [0.0] * dim
    # 3) declared stub boundary for codec-requiring formats
    if v is None:
        if pil_failed:
            # PIL (the opt-in authority) rejected the payload and no
            # stdlib path covers it: a decode FAILURE, not a stub
            # format — same zeros as other corrupt payloads
            if strict:
                raise ValueError("blob decode failed")
            return [0.0] * dim
        if allow_fake:
            h = hashlib.blake2b(raw, digest_size=dim).digest()
            v = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
            v = v / 255.0 * 2 - 1
        else:
            raise NotImplementedError(
                "image decode for this format requires codec libs "
                "(PIL) not present in this container; ppm/pgm/bmp "
                "decode natively — pass allow_fake=True for the "
                "plumbing-test path on other formats"
            )
    n = np.linalg.norm(v)
    return [float(x) for x in (v / n if n else v)]


def image_meta_udf():
    """binary -> (width, height, format) typed metadata by header
    sniffing alone (codecs.sniff_image_meta) — covers png/jpeg/gif/
    bmp/ppm with zero codec dependencies; nulls for unknown payloads."""

    @F.pandas_udf(IMAGE_META_SCHEMA)
    def _meta(content: pd.Series) -> pd.DataFrame:
        from ember_spark.functions.codecs import sniff_image_meta

        rows = [
            sniff_image_meta(bytes(b) if b is not None else None) for b in content
        ]
        return pd.DataFrame(rows, columns=["width", "height", "format"])

    return _meta


def extract_image_meta(
    df: DataFrame, content_col: str = "content", out_prefix: str = ""
) -> DataFrame:
    """Append width/height/format columns sniffed from the binary."""
    m = image_meta_udf()
    out = df.withColumn("_immeta", m(F.col(content_col)))
    for name in ["width", "height", "format"]:
        out = out.withColumn(f"{out_prefix}{name}", F.col(f"_immeta.{name}"))
    return out.drop("_immeta")


def audio_feature_extractor(dim: int = 16, allow_fake: bool = False):
    """binary (PCM WAV) -> float descriptor: frame RMS energies + global
    zero-crossing rate (codecs.audio_features), Arrow-batched. The WAV
    decode is REAL (stdlib `wave`); other audio formats hit the same
    stub boundary as images."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _extract(content: pd.Series) -> pd.Series:
        from ember_spark.functions.codecs import audio_features, decode_wav

        out = []
        for b in content:
            if b is None:
                out.append([0.0] * dim)
                continue
            raw = bytes(b)
            try:
                _, x = decode_wav(raw)
                v = audio_features(x, dim)
            except NotImplementedError:
                if not allow_fake:
                    raise
                h = hashlib.blake2b(raw, digest_size=dim).digest()
                v = np.frombuffer(h, dtype=np.uint8).astype(np.float64) / 255.0
            except Exception:
                v = np.zeros(dim)
            out.append([float(x) for x in v])
        return pd.Series(out)

    return _extract


def extract_audio_features(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "audio_features",
    dim: int = 16,
    allow_fake: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Append audio feature vectors (same heavy-binary repartition
    guidance as extract_image_features)."""
    if partitions:
        df = df.repartition(partitions)
    fx = audio_feature_extractor(dim=dim, allow_fake=allow_fake)
    return df.withColumn(out_col, fx(F.col(content_col)))


def video_frames_udf(every_k: int = 1):
    """Arrow-batched container split: binary video column ->
    array<binary> of standalone decodable frames, thinned to every
    k-th frame AT THE SPLIT so dropped frames are never serialized or
    shipped through Arrow (for a decoded-in-Python GIF canvas that is
    the whole cost; for AVI it is list slicing on opaque bytes —
    identical selection to `sample_frames`, applied where the data
    already lives). MJPEG AVI yields its JPEG frames verbatim
    (codecs.parse_avi_mjpeg, a pure RIFF walk — pixel decode is NOT
    paid here); animated GIF yields its disposal/transparency-
    composited canvases re-serialized as raw P6 PPM (header + pixels,
    and downstream stays format-agnostic). ANY unparseable payload —
    wrong magic, declared codec boundary, truncated/corrupt structure
    (struct.error, IndexError, ...) — yields NULL so a crawled corpus
    with junk rows keeps flowing."""
    if every_k < 1:
        # fail the CALLER's configuration error eagerly: every_k=0 would
        # raise inside the per-row try/except and silently NULL every row
        raise ValueError(f"every_k must be >= 1, got {every_k}")

    @F.pandas_udf(ArrayType(BinaryType()))
    def _split(content: pd.Series) -> pd.Series:
        from ember_spark.functions.codecs import (
            make_ppm,
            parse_avi_mjpeg,
            parse_gif_frames,
        )

        out = []
        for b in content:
            if b is None:
                out.append(None)
                continue
            raw = bytes(b)
            try:
                if raw[:6] in (b"GIF87a", b"GIF89a"):
                    canvases = parse_gif_frames(raw)[1][::every_k]
                    out.append([make_ppm(f) for f in canvases])
                else:
                    out.append(parse_avi_mjpeg(raw)[1][::every_k])
            except Exception:
                out.append(None)
        return pd.Series(out)

    return _split


def extract_video_features(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "video_features",
    dim: int = 32,
    every_k: int = 2,
    use_pil: bool = False,
) -> DataFrame:
    """Video feature dataflow, Spark-first and row-local: ONE Python
    pass splits the container and thins to every k-th frame (dropped
    frames never serialize into the Arrow stream), and a second Arrow
    pass decodes the kept frames and mean-pools their image features
    per video. No explode/groupBy/join: the pooling is per row, so no
    shuffle, no row-id to keep consistent across branches, and every
    other column rides along untouched. Rows whose container fails to
    parse get NULL; a kept frame that cannot decode (declared codec
    boundary — e.g. one progressive-JPEG frame in an otherwise-fine
    MJPEG stream) is skipped from the pool rather than failing the
    stage, and a video with NO decodable frames pools NULL."""
    side = max(int(round(dim ** 0.5)), 1)

    @F.pandas_udf(ArrayType(FloatType()))
    def _pool(frames: pd.Series) -> pd.Series:
        pil_image = _require_pil() if use_pil else None
        out = []
        for fl in frames:
            if fl is None or len(fl) == 0:
                out.append(None)
                continue
            feats = []
            for f in fl:
                try:
                    feats.append(
                        _blob_feature(
                            bytes(f), dim, side, False, pil_image, strict=True
                        )
                    )
                except Exception:
                    # undecodable frame — declared codec boundary OR a
                    # corrupt frame whose magic matched (strict mode
                    # raises for those instead of returning zeros):
                    # skip it, don't dilute the pool or fail the stage
                    continue
            if not feats:
                out.append(None)
                continue
            out.append([float(x) for x in np.array(feats).mean(axis=0)])
        return pd.Series(out)

    return df.withColumn(
        out_col, _pool(video_frames_udf(every_k)(F.col(content_col)))
    )


def sample_frames(frames: Column | str, every_k: int) -> Column:
    """Video-as-frame-array sampling: keep every k-th frame of an
    array<binary> column. Pure JVM expression (two-arg `filter` over
    the array index) — the frame payloads never cross into Python."""
    col = F.col(frames) if isinstance(frames, str) else frames
    return F.filter(col, lambda x, i: i % every_k == 0)


def extract_image_features(
    df: DataFrame,
    content_col: str = "content",
    out_col: str = "img_features",
    dim: int = 32,
    deterministic_fake: bool = False,
    partitions: int | None = None,
    use_pil: bool = False,
) -> DataFrame:
    """Append image feature vectors. Binary payloads are heavy: an
    explicit repartition ahead of the UDF keeps Arrow batches balanced
    (no hot partition carrying all the bytes). `use_pil` is the explicit
    PIL opt-in (see image_feature_extractor)."""
    if partitions:
        df = df.repartition(partitions)
    fx = image_feature_extractor(
        dim=dim, allow_fake=deterministic_fake, use_pil=use_pil
    )
    return df.withColumn(out_col, fx(F.col(content_col)))


def _stack_or_nan(col: pd.Series, dim: int) -> np.ndarray:
    """Stack a batch of width-`dim` vectors, mapping NULL (or
    wrong-width) rows to NaN rows. np.stack over a batch containing
    None raises an opaque shape error and kills the whole stage; a
    null vector should instead yield NaN features for ITS row
    (left/outer joins legitimately produce them)."""
    nan_row = np.full(dim, np.nan)
    return np.stack([
        nan_row
        if x is None or len(x) != dim
        else np.asarray(x, dtype=np.float64)
        for x in col
    ])


def _pair_dim(a: pd.Series, b: pd.Series) -> int:
    """Vector width shared by a pair batch: the first non-null row of
    either side (0 only when every row of both sides is null)."""
    for col in (a, b):
        for x in col:
            if x is not None:
                return len(x)
    return 0


#: M5 pair-fusion feature names
IMG_FEATURES = ["img_cos", "img_diff_l2", "img_hadamard_mean"]


def image_pair_features_udf():
    """M5 twin-tower fusion surface (reference `vision_matcher.py:53-58`
    concatenates [a, b, a-b, a*b] into an MLP; the feature-classifier
    mirror reduces each block to its scalar summary): cosine(a,b),
    ||a-b||_2, mean(a*b) — one Arrow batch pass, numpy-vectorized."""

    @F.pandas_udf(
        "img_cos double, img_diff_l2 double, img_hadamard_mean double"
    )
    def _feats(a: pd.Series, b: pd.Series) -> pd.DataFrame:
        dim = _pair_dim(a, b)
        A = _stack_or_nan(a, dim)
        B = _stack_or_nan(b, dim)
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        denom = na * nb
        cos = np.where(denom > 0, (A * B).sum(axis=1) / np.where(denom > 0, denom, 1), 0.0)
        diff = np.linalg.norm(A - B, axis=1)
        had = (A * B).mean(axis=1)
        return pd.DataFrame(
            {"img_cos": cos, "img_diff_l2": diff, "img_hadamard_mean": had}
        )

    return _feats


def image_pair_features(
    pairs: DataFrame, left_col: str = "img_features_l", right_col: str = "img_features_r"
) -> DataFrame:
    """Append the three M5 fusion features for a pair table carrying two
    image feature vectors."""
    f = image_pair_features_udf()
    out = pairs.withColumn("_imf", f(F.col(left_col), F.col(right_col)))
    for name in IMG_FEATURES:
        out = out.withColumn(name, F.col(f"_imf.{name}"))
    return out.drop("_imf")


def gated_sum_udf(weights: list[float], bias: float = 0.0):
    """M6 gated sum (reference `gatedsum.py:13-20`): fuse two modality
    vectors with a learned soft gate — g = sigma(w.[a;b]+bias),
    out = g*a + (1-g)*b. `weights` has length 2*dim. Broadcast into the
    UDF closure like the matcher weights (no per-row python)."""
    w = np.asarray(weights, dtype=np.float64)

    @F.pandas_udf(ArrayType(FloatType()))
    def _gate(a: pd.Series, b: pd.Series) -> pd.Series:
        dim = _pair_dim(a, b)
        A = _stack_or_nan(a, dim)
        B = _stack_or_nan(b, dim)
        z = np.concatenate([A, B], axis=1) @ w + bias
        g = 1.0 / (1.0 + np.exp(-z))
        out = g[:, None] * A + (1.0 - g[:, None]) * B
        return pd.Series([[float(x) for x in row] for row in out])

    return _gate
