"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The container has no image/audio codecs (no PIL/cv2/ffmpeg), so the
decode step is STUBBED: ``decode_image`` raises a clearly-marked
NotImplementedError unless a deterministic fake decoder is requested. The
Spark-side plumbing — schema, batch shape, partitioning, UDF signature —
is real and tested; swapping in a real codec touches exactly one
function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_ASSET_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("doc_id", StringType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("mime", StringType()),
    StructField("width", IntegerType()),        # -1 when n/a
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),     # -1 when n/a
    StructField("payload", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("doc_id", StringType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", ArrayType(FloatType())),
])


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an encoded image payload to an HxWx3 uint8 array.

    Real path requires an image codec (PIL/cv2) that this container lacks
    — STUB. ``fake=True`` returns a deterministic 8x8 pseudo-image derived
    from the payload hash so downstream plumbing can be exercised."""
    if fake:
        h = hashlib.sha256(payload).digest()
        base = np.frombuffer((h * 6)[:192], dtype=np.uint8)
        return base.reshape(8, 8, 3)
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL/cv2, not present in this "
            "environment; pass fake=True for the deterministic stub"
        ) from e
    import io
    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


def _u32_from_bytes(payload: bytes, dim: int = 16) -> list[int]:
    """The integer core of the fake embedding: sha256(payload) repeated to
    dim*4 bytes, read as little-endian uint32s. Exactly reconstructible in
    SQL from the hex digest, which is what the q_media_features oracle
    does — integer equality, no float32 rounding ambiguity."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[:dim * 4],
                        dtype=np.uint32)
    return [int(v) for v in raw]


def _feature_from_bytes(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic hash-derived feature vector (stands in for a real
    embedding model; same contract: payload -> fixed-dim float list)."""
    raw = np.asarray(_u32_from_bytes(payload, dim), dtype=np.float64)
    return (raw / np.float64(2**32)).astype(np.float32).tolist()


def extract_features(assets: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over the opaque payload column.

    Real deployments replace ``_feature_from_bytes`` with decode +
    model-forward inside the same batch loop; the dataflow (repartition →
    mapInPandas → array<float> column) is the production shape."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                "feature": pdf["payload"].map(
                    lambda b: _feature_from_bytes(b if b is not None else b"", dim)),
            })
            yield out

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


FEATURE_U32_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("doc_id", StringType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature_u32", ArrayType(LongType())),
])


def extract_features_u32(assets: DataFrame, dim: int = 16) -> DataFrame:
    """Same Arrow-batched dataflow as :func:`extract_features`, emitting
    the underlying little-endian uint32 words instead of scaled floats —
    the oracle-gated surface (exact BIGINT equality across engines)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "doc_id": pdf["doc_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else 0).astype("int64"),
                "feature_u32": pdf["payload"].map(
                    lambda b: _u32_from_bytes(b if b is not None else b"", dim)),
            })

    return assets.mapInPandas(run, schema=FEATURE_U32_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Native frame-sampling plan for video assets: one row per planned
    frame timestamp (the decode of those frames is the stubbed step)."""
    v = assets.filter(F.col("kind") == "video")
    ts = F.sequence(F.lit(0).cast("long"),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
                    F.lit(every_ms).cast("long"))
    return (v.select("asset_id", "doc_id",
                     F.explode(ts).alias("frame_ts_ms")))


def image_dhash(resized: DataFrame, out_w: int = 9,
                out_h: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) over resized image pixels —
    the LAION-style image near-dup signature: two images whose pixels
    differ only by re-encoding/scaling/brightness produce hashes within
    a few Hamming bits.

    Input is :func:`resize_images` output shape (``pixels`` =
    flattened row-major ``out_h x out_w x 3``); standard dHash uses
    ``out_w=9, out_h=8`` → 8 comparisons per row → a 64-bit hash.
    Grayscale is the exact integer channel sum (no luma weights — no
    float rounding to disagree across engines); bit ``8*y + x`` is set
    when ``gray(y, x+1) > gray(y, x)``.

    Returns ``(asset_id, doc_id, b0..b{out_h-1}, dhash_hex)`` — one
    byte column per pixel row (these are exactly the Hamming-join
    bands :func:`dhash_pairs` buckets on) plus the concatenated hex
    digest. Pure codegen projection: ``3*w*h`` array gets + ``(w-1)*h``
    comparisons, no Python, no shuffle."""
    byte_cols, hex_col = _dhash_exprs(out_w, out_h)
    return resized.select(F.col("asset_id"), F.col("doc_id"),
                          *byte_cols, hex_col)


def _dhash_exprs(out_w: int, out_h: int):
    """The dHash byte/hex column expressions (aliased ``b0..b{h-1}``
    and ``dhash_hex``), reusable on any lineage carrying ``pixels``.

    Each output column is built as ONE SQL expression string parsed by
    a single ``F.expr`` call: assembling the 64-comparison tree
    Column-by-Column costs ~1.1k py4j round-trips, which at 9x8 is
    ~1.7 s of pure driver time PER PLAN BUILD (measured r6; the bench
    clock includes plan construction). The parsed tree is the same
    Catalyst shape (GetArrayItem / CaseWhen / Cast) node for node, so
    outputs are bit-identical."""
    def gray(y: int, x: int) -> str:
        k = 3 * (out_w * y + x)
        return f"(pixels[{k}] + pixels[{k + 1}] + pixels[{k + 2}])"

    byte_cols, hex_parts = [], []
    for y in range(out_h):
        terms = ["CAST(0 AS BIGINT)"]
        for x in range(out_w - 1):
            terms.append(
                f"(CASE WHEN {gray(y, x + 1)} > {gray(y, x)}"
                f" THEN CAST({1 << x} AS BIGINT)"
                f" ELSE CAST(0 AS BIGINT) END)")
        byte_sql = " + ".join(terms)
        byte_cols.append(F.expr(byte_sql).alias(f"b{y}"))
        hex_parts.append(f"format_string('%02x', CAST({byte_sql} AS INT))")
    hex_col = F.expr("concat(" + ", ".join(hex_parts) + ")") \
        .alias("dhash_hex")
    return byte_cols, hex_col


def dhash_pairs(hashes: DataFrame, max_hamming: int = 6,
                band_bytes: int = 2, max_bucket: int = 200) -> DataFrame:
    """Near-duplicate image pairs via banded Hamming join over
    :func:`image_dhash` output.

    Consecutive groups of ``band_bytes`` row bytes form one LSH band
    (``band_bytes=1`` → 8 bands of 8 bits; ``band_bytes=2`` → 4 bands
    of 16 bits): images sharing ANY band value become candidates
    (pigeonhole: every pair within Hamming distance ``n_bands - 1`` is
    guaranteed a shared band; beyond that recall decays gracefully, the
    standard LSH trade). Candidates are verified with the exact
    distance ``sum(bit_count(a.b_y XOR b.b_y))`` and filtered to
    ``<= max_hamming``.

    Scale — the DEFAULT ``band_bytes=2`` is the scale-safe choice: a
    1-byte band has only 256 distinct values, so past ~50k images EVERY
    bucket exceeds any sane ``max_bucket`` and the hot-key cap starts
    dropping true pairs
    (measured: 200k images planted with 30k ≤4-bit pairs → 17,285
    found at ``band_bytes=1, max_bucket=200``; 30,000/30,000 at
    ``band_bytes=2`` — see BENCH/BASELINE.md). 2-byte bands give 65k
    values/band (≈N/65k rows per bucket) while still guaranteeing
    every pair within Hamming 3; the cap then only fires on genuinely
    degenerate buckets (flat-color thumbnails, the all-zero hash),
    which cannot quadratically explode a task.

    Each band row CARRIES all hash byte columns (64 extra bytes
    per row), so the verify distance is computed inline on the
    self-join output instead of joining the pair set back to the hash
    table twice: the self-join key equals the hot-key window's
    partitioning, Spark reuses that exchange, and the whole operator is
    ONE band shuffle + ONE pair groupBy (was 7 exchanges / 3
    sort-merge joins as candidate-then-verify). The ``<= max_hamming``
    filter runs before the pair dedup, shrinking the final shuffle to
    surviving pairs only. Returns ``(asset_a, asset_b, hamming)``
    distinct pairs."""
    byte_cols = [c for c in hashes.columns if c.startswith("b")
                 and c[1:].isdigit()]
    byte_cols.sort(key=lambda c: int(c[1:]))
    if len(byte_cols) % band_bytes:
        raise ValueError(
            f"band_bytes={band_bytes} must divide the "
            f"{len(byte_cols)} hash bytes evenly")
    band_vals = []
    for i in range(0, len(byte_cols), band_bytes):
        v = None
        for k, c in enumerate(byte_cols[i:i + band_bytes]):
            term = (F.col(c) if k == 0
                    else F.shiftleft(F.col(c), 8 * k).cast("long"))
            v = term if v is None else v + term
        band_vals.append(v)
    bands = hashes.select(
        F.col("asset_id"), *byte_cols,
        F.posexplode(F.array(*band_vals))
        .alias("band_idx", "band_val"))
    if max_bucket:
        from pyspark.sql import Window
        w = Window.partitionBy("band_idx", "band_val").orderBy("asset_id")
        bands = (bands.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") <= max_bucket).drop("_rn"))
    joined = (bands.alias("x")
              .join(bands.alias("y"),
                    (F.col("x.band_idx") == F.col("y.band_idx"))
                    & (F.col("x.band_val") == F.col("y.band_val"))
                    & (F.col("x.asset_id") < F.col("y.asset_id"))))
    ham = None
    for c in byte_cols:
        term = F.bit_count(
            F.col(f"x.{c}").bitwiseXOR(F.col(f"y.{c}")))
        ham = term if ham is None else ham + term
    return (joined.select(F.col("x.asset_id").alias("asset_a"),
                          F.col("y.asset_id").alias("asset_b"),
                          ham.cast("long").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .groupBy("asset_a", "asset_b")
            .agg(F.first("hamming").alias("hamming")))


def image_near_dedup(resized: DataFrame, max_hamming: int = 6,
                     band_bytes: int = 2, max_bucket: int = 200,
                     num_partitions: int | None = None,
                     check_every: int = 1,
                     cache_input: bool = True,
                     algorithm: str = "doubling") -> DataFrame:
    """Composed perceptual image dedup (the LAION-style removal pass):
    dHash → banded Hamming pairs → connected components → keep the
    minimum ``asset_id`` per cluster. Returns the SURVIVING rows of
    ``resized`` with their ``dhash_hex`` attached — re-encoded /
    brightness-shifted copies collapse to one representative.

    Scale shape: everything upstream is the audited
    :func:`image_dhash` / :func:`dhash_pairs` plans; clustering runs on
    the PAIR graph only (orders of magnitude smaller than the corpus —
    ``num_partitions`` sizes its per-round shuffles). The hash columns
    are computed INLINE on the survivor lineage (dHash is a pure
    projection), so the removal costs exactly one left-anti join
    against the dropped-node set — no corpus-sized join back to a hash
    table.

    ``resized`` has TWO consumers (the pair lineage and the survivor
    select), so per the composed-op seam rule it is localCheckpointed
    once with its hash attached (``cache_input=True``; measured
    10.6 → 8.2 s steady / 21.8 → 9.8 s first-call at sf0.1 — the
    resize mapInPandas ran twice uncached). Pass ``cache_input=False``
    when the input is already a materialized table."""
    from .dedup import duplicate_clusters
    _, hex_col = _dhash_exprs(9, 8)
    hashed = resized.select("*", hex_col)
    if cache_input:
        hashed = hashed.localCheckpoint(eager=True)
    pairs = dhash_pairs(image_dhash(hashed), max_hamming=max_hamming,
                        band_bytes=band_bytes, max_bucket=max_bucket)
    # perceptual-hash graphs CHAIN (A~B, B~C without A~C): the measured
    # sf0.1 pair graph has BFS diameter ~7, which cost min-label
    # propagation 10 rounds. Pointer doubling is the default here —
    # O(log diameter) rounds — while the near-clique LSH text graphs
    # keep plain propagation.
    clusters = duplicate_clusters(pairs, "asset_a", "asset_b",
                                  num_partitions=num_partitions,
                                  check_every=check_every,
                                  algorithm=algorithm)
    drop = (clusters.filter(F.col("node") != F.col("cluster"))
            .select(F.col("node").alias("asset_id")))
    return hashed.join(drop, "asset_id", "left_anti")


RESIZED_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("doc_id", StringType()),
    StructField("kind", StringType()),
    StructField("out_w", IntegerType()),
    StructField("out_h", IntegerType()),
    StructField("pixels", ArrayType(LongType())),   # flattened uint8 HxWx3
])


def resize_images(assets: DataFrame, out_w: int = 4, out_h: int = 4,
                  fake: bool = False) -> DataFrame:
    """Nearest-neighbor resize over decoded image payloads, Arrow-batched
    (mapInPandas) — the third leg of the multimodal family
    (decode / feature-extract / RESIZE / frame-sample).

    Real deployments decode with a codec and resize with the same
    ``(arange(out)*in)//out`` index map below; here the decode is the
    deterministic fake (``decode_image(fake=True)``, 8x8x3 from the
    payload sha256) so the resize arithmetic and the batch plumbing are
    exactly oracle-checkable (gate q_media_resize reconstructs the
    selected bytes from the hex digest in SQL). Output pixels are the
    flattened row-major HxWx3 values."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                img = decode_image(bytes(t.payload), fake=fake)
                in_h, in_w = img.shape[:2]
                ys = (np.arange(out_h) * in_h) // out_h
                xs = (np.arange(out_w) * in_w) // out_w
                small = img[np.ix_(ys, xs)]
                rows.append((t.asset_id, t.doc_id, t.kind, out_w, out_h,
                             small.reshape(-1).astype(np.int64).tolist()))
            yield pd.DataFrame(rows, columns=["asset_id", "doc_id", "kind",
                                              "out_w", "out_h", "pixels"])

    imgs = assets.filter(F.col("kind") == "image")
    return imgs.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_PIXEL_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("doc_id", StringType()),
    StructField("frame_ts_ms", LongType()),
    StructField("pixels", ArrayType(LongType())),
])


def video_frame_dhash(assets: DataFrame, every_ms: int = 500,
                      out_w: int = 9, out_h: int = 8,
                      fake: bool = False) -> DataFrame:
    """Per-frame perceptual hashes for video assets: sample one frame
    every ``every_ms`` (the :func:`frame_sample_plan` schedule), decode
    + nearest-neighbor-resize each frame (Arrow-batched), and dHash the
    pixels with the exact :func:`image_dhash` arithmetic. Returns
    ``(asset_id, doc_id, frame_ts_ms, b0.., dhash_hex)``.

    The real frame decode needs ffmpeg/cv2 (absent here) — STUB;
    ``fake=True`` derives each frame from
    ``sha256(payload + b'@' + str(ts))`` so the whole schedule → decode
    → resize → hash chain is deterministic and oracle-checkable. The
    per-(asset, frame) rows are the parallelism unit: a 3-hour video
    fans out to thousands of independent frame rows, and only 16-char
    hex signatures + 8 byte columns survive the projection."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                n = max(int(t.duration_ms) - 1, 0) // every_ms + 1
                for k in range(n):
                    ts = k * every_ms
                    frame = decode_image(
                        bytes(t.payload) + b"@" + str(ts).encode(),
                        fake=fake)
                    in_h, in_w = frame.shape[:2]
                    ys = (np.arange(out_h) * in_h) // out_h
                    xs = (np.arange(out_w) * in_w) // out_w
                    small = frame[np.ix_(ys, xs)]
                    rows.append((t.asset_id, t.doc_id, ts,
                                 small.reshape(-1).astype(np.int64)
                                 .tolist()))
            yield pd.DataFrame(rows, columns=["asset_id", "doc_id",
                                              "frame_ts_ms", "pixels"])

    vids = assets.filter(F.col("kind") == "video")
    frames = vids.mapInPandas(run, schema=FRAME_PIXEL_SCHEMA)
    byte_cols, hex_col = _dhash_exprs(out_w, out_h)
    return frames.select("asset_id", "doc_id", "frame_ts_ms",
                         *byte_cols, hex_col)


def video_near_duplicates(frame_hashes: DataFrame, threshold: float = 0.3,
                          max_bucket: int = 200) -> DataFrame:
    """Video-level near-duplicates via frame-hash set overlap — the
    video analog of n-gram Jaccard: re-encoded copies share every frame
    hash (jaccard 1.0), trimmed/extended cuts share a prefix (jaccard =
    overlap fraction), unrelated videos share nothing.

    One distinct per (video, frame hash), one equi-join on the hash
    value (``max_bucket`` caps videos per hash — a black-frames hash
    shared by half of YouTube cannot explode a task), one pair
    aggregation, then a size join for the exact Jaccard. Set semantics
    (not multiset) make the measure order- and rate-insensitive.
    Returns ``(asset_a, asset_b, n_shared, jaccard)``."""
    return _set_overlap_pairs(frame_hashes, "dhash_hex", threshold,
                              max_bucket)


def _set_overlap_pairs(df: DataFrame, val_col: str, threshold: float,
                       max_bucket: int) -> DataFrame:
    """Shared signature-set Jaccard machinery (video frame hashes,
    audio fingerprint shingles): distinct per (asset, value) →
    ``max_bucket`` hot-key cap → equi-self-join on the value → pair
    count → exact Jaccard via a size join. The capped set feeds three
    consumers (sizes + both self-join sides), so it is persisted at
    that seam (lazy localCheckpoint — reference-tracked, leak-free,
    unlike .cache()) — otherwise the signature-extraction lineage
    upstream executes once per consumer (house rule for composed
    ops)."""
    fr = df.select("asset_id", val_col).distinct()
    if max_bucket:
        from pyspark.sql import Window
        w = Window.partitionBy(val_col).orderBy("asset_id")
        fr = (fr.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= max_bucket).drop("_rn"))
    fr = fr.localCheckpoint(eager=False)
    sizes = fr.groupBy("asset_id").agg(F.count("*").alias("n"))
    shared = (fr.alias("x")
              .join(fr.alias("y"),
                    (F.col(f"x.{val_col}") == F.col(f"y.{val_col}"))
                    & (F.col("x.asset_id") < F.col("y.asset_id")))
              .groupBy(F.col("x.asset_id").alias("asset_a"),
                       F.col("y.asset_id").alias("asset_b"))
              .agg(F.count("*").cast("long").alias("n_shared")))
    return (shared
            .join(sizes.select(F.col("asset_id").alias("asset_a"),
                               F.col("n").alias("_na")), "asset_a")
            .join(sizes.select(F.col("asset_id").alias("asset_b"),
                               F.col("n").alias("_nb")), "asset_b")
            .withColumn("jaccard",
                        F.col("n_shared")
                        / (F.col("_na") + F.col("_nb") - F.col("n_shared")))
            .filter(F.col("jaccard") >= threshold)
            .select("asset_a", "asset_b", "n_shared",
                    F.round("jaccard", 6).alias("jaccard")))


def audio_fingerprint(assets: DataFrame, win_ms: int = 250,
                      shingle: int = 3) -> DataFrame:
    """Audio fingerprinting as chained window-hash shingles — the
    Shazam-shaped signature: the stream is framed into ``win_ms``
    windows, each window gets a 60-bit hash, and the landmark unit is
    the SHINGLE of ``shingle`` consecutive window hashes (order
    matters: a re-encode shares every shingle, a trimmed cut shares the
    prefix shingles, a shuffled remix shares almost none).

    The per-window feature extraction is the codec-gated step; the
    stand-in derives window ``w``'s hash from
    ``sha2(payload || '#' || w)``. Because that makes each window hash
    a PURE EXPRESSION of (payload, index), the shingle at position
    ``s`` is computed inline from the hashes at ``s..s+shingle-1`` —
    one posexplode over shingle positions, zero window functions, zero
    shuffles, whole-stage codegen end to end. Assets shorter than
    ``shingle`` windows emit no rows. Returns
    ``(asset_id, doc_id, shingle_idx, fp_hash)``."""
    aud = assets.filter(F.col("kind") == "audio")
    n_win = (F.greatest(F.col("duration_ms") - 1, F.lit(0))
             / win_ms).cast("long") + 1

    def win_hash(idx):
        raw = F.concat(F.col("payload"), F.encode(F.lit("#"), "utf-8"),
                       F.encode(idx.cast("string"), "utf-8"))
        return F.conv(F.substring(F.sha2(raw, 256), 1, 15), 16, 10) \
                .cast("long")

    pos = (aud.filter(n_win >= shingle)
           .select("asset_id", "doc_id", "payload",
                   F.posexplode(F.sequence(
                       F.lit(0).cast("long"),
                       (n_win - shingle).cast("long")))
                   .alias("shingle_idx", "_s")))
    parts = [win_hash(F.col("_s") + k).cast("string") for k in
             range(shingle)]
    joined = F.concat_ws(":", *parts)
    fp = F.conv(F.substring(F.sha2(F.encode(joined, "utf-8"), 256), 1, 15),
                16, 10).cast("long")
    return pos.select("asset_id", "doc_id",
                      F.col("shingle_idx").cast("long").alias("shingle_idx"),
                      fp.alias("fp_hash"))


def audio_near_duplicates(fingerprints: DataFrame, threshold: float = 0.3,
                          max_bucket: int = 200) -> DataFrame:
    """Audio near-duplicates via fingerprint-shingle set overlap —
    same pair machinery as :func:`video_near_duplicates` (distinct →
    hot-key cap → equi-self-join → exact Jaccard), keyed on the chained
    window hashes so matches require consecutive-window agreement, not
    just bag-of-windows overlap."""
    return _set_overlap_pairs(
        fingerprints.withColumnRenamed("fp_hash", "_v"), "_v",
        threshold, max_bucket)
