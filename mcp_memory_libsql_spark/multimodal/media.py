"""Multimodal column plumbing: opaque binary media + typed metadata,
processed with Arrow-batched pandas UDFs (``mapInPandas``).

The real decode (image/audio codecs) is STUBBED — the decode libs
aren't in this container — behind ``decode_stub``, which produces a
deterministic fake so the pipeline is testable end-to-end. Everything
Spark-side is real and scale-shaped:

- media rows are (media_id, kind, payload binary, meta struct);
- processing is ``mapInPandas`` so payloads stream through Arrow in
  batches (no per-row Python overhead, bounded executor memory via
  ``spark.sql.execution.arrow.maxRecordsPerBatch``);
- at 100 TB: payloads live in parquet binary columns partitioned by
  kind/date; feature extraction is a narrow map — no shuffle at all.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, "
    "mean_intensity double, frame_hashes array<string>"
)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from documents: payload
    = utf-8 text bytes standing in for encoded media; metadata derived
    from doc stats. Mirrors how a real ingest would attach typed
    metadata next to the opaque blob."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 48 + 1).cast("int").alias("height"),
            (F.col("n_chars") % 10 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, kind: str) -> bytes:
    """STUB for the real codec. A real build would dispatch to
    PIL/ffmpeg here; the container has neither, so we return the
    payload unchanged (deterministic passthrough)."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"unknown media kind: {kind}")
    return payload


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the opaque payloads:
    byte length, mean byte intensity of the decoded blob, and
    per-frame content hashes (frame sampling = even byte-range split
    by meta.n_frames).

    The worker closure is SELF-CONTAINED (nested ``_decode`` instead
    of the module-level ``decode_stub``): cloudpickle serializes
    module functions by reference, which would require this package
    on every executor's import path — nested defs ship by value, so
    the job runs on plain executors with no package deployment."""

    def _decode(payload: bytes, kind: str) -> bytes:
        # keep in sync with decode_stub (the public stub API)
        if kind not in ("image", "audio", "video"):
            raise NotImplementedError(f"unknown media kind: {kind}")
        return payload

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                blob = _decode(bytes(r.payload), r.kind)
                n_frames = max(int(r.meta["n_frames"]), 1)
                step = max(len(blob) // n_frames, 1)
                frames = [
                    blob[i * step : (i + 1) * step] for i in range(n_frames)
                ]
                rows.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "n_bytes": len(blob),
                        "mean_intensity": (
                            float(sum(blob)) / len(blob) if blob else 0.0
                        ),
                        "frame_hashes": [
                            hashlib.md5(fr).hexdigest() for fr in frames if fr
                        ],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "n_bytes",
                    "mean_intensity",
                    "frame_hashes",
                ],
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: metadata is updated JVM-side; the pixel
    transform itself is the stubbed codec step."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    )


FRAME_SCHEMA = (
    "media_id bigint, frame_idx int, frame_bytes int, frame_md5 string"
)


def sample_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling: keep every ``stride``-th frame of each media
    blob (frame = even byte-range split by meta.n_frames, same
    geometry as ``extract_features``) → one row per kept frame.

    Arrow-batched mapInPandas with a per-row explode in pandas —
    still a narrow map (no shuffle); output rows ≈ input rows ×
    n_frames/stride. At 100 TB this is the decode→sample step before
    a vision encoder; the codec is the same disclosed stub."""

    def batches(it):
        import hashlib as _hl

        import pandas as _pd

        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                blob = bytes(r.payload)
                n_frames = max(int(r.meta["n_frames"]), 1)
                step = max(len(blob) // n_frames, 1)
                for i in range(0, n_frames, stride):
                    fr = blob[i * step : (i + 1) * step]
                    if not fr:
                        continue
                    out.append(
                        {
                            "media_id": r.media_id,
                            "frame_idx": i,
                            "frame_bytes": len(fr),
                            "frame_md5": _hl.md5(fr).hexdigest(),
                        }
                    )
            yield _pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "frame_bytes", "frame_md5"],
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


WINDOW_SCHEMA = (
    "media_id bigint, win_idx int, win_start int, win_bytes int, "
    "win_md5 string, mean_byte double"
)


def audio_windows(
    media: DataFrame, window: int = 64, hop: int = 32
) -> DataFrame:
    """Overlapping-window framing of audio payloads (the STFT /
    feature-extraction geometry: window of ``window`` bytes every
    ``hop`` bytes, trailing partial window kept) → one row per
    window with its byte span, content hash and mean byte value.

    Arrow-batched mapInPandas, narrow map, output ≈ rows ×
    len/hop — exactly the fan-out an acoustic featurizer produces
    before a downstream encoder. Real sample decode is the same
    disclosed stub (payload bytes stand in for PCM samples); the
    windowing arithmetic, batch shape, and schema are the real
    plumbing. Only kind='audio' rows are framed — the filter is
    JVM-side so parquet prunes the other kinds before Python."""

    def batches(it):
        import hashlib as _hl

        import pandas as _pd

        # Nested decode stub: the closure must ship by value (the repo
        # isn't importable on executors under the driver's vanilla
        # session) — same pattern as extract_features/_decode.
        def _decode(payload: bytes, kind: str) -> bytes:
            if kind not in ("image", "audio", "video"):
                raise NotImplementedError(f"unknown media kind: {kind}")
            return payload

        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                blob = bytes(_decode(r.payload, r.kind))
                n = len(blob)
                idx = 0
                for start in range(0, max(n - window, 0) + hop, hop):
                    w = blob[start : start + window]
                    if not w:
                        break
                    out.append(
                        {
                            "media_id": r.media_id,
                            "win_idx": idx,
                            "win_start": start,
                            "win_bytes": len(w),
                            "win_md5": _hl.md5(w).hexdigest(),
                            "mean_byte": round(sum(w) / len(w), 6),
                        }
                    )
                    idx += 1
            yield _pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "win_idx",
                    "win_start",
                    "win_bytes",
                    "win_md5",
                    "mean_byte",
                ],
            )

    return media.where(F.col("kind") == "audio").mapInPandas(
        batches, schema=WINDOW_SCHEMA
    )


def image_patches(media: DataFrame, patch: int = 16) -> DataFrame:
    """ViT-style patch grid over image media → one row per patch
    (media_id, px, py, patch_chars, patch_md5): the preprocessing
    explode a vision-transformer training pipeline runs before
    embedding (image → ceil(w/p)×ceil(h/p) patches).

    The pixel decode is the container-stubbed step, so patch CONTENT
    is the deterministic even split of the decoded payload (same
    stand-in contract as ``sample_frames``); the grid geometry,
    explode shape, and per-patch hashing are the real Spark plumbing.
    Pure column expressions — narrow explode, no shuffle, no Python —
    and fully oracle-checkable."""
    q = patch - 1
    img = media.where(F.col("kind") == "image").select(
        "media_id",
        F.decode(F.col("payload"), "utf-8").alias("txt"),
        F.expr(f"(meta.width + {q}) div {patch}").alias("nx"),
        F.expr(f"(meta.height + {q}) div {patch}").alias("ny"),
    ).where((F.col("nx") > 0) & (F.col("ny") > 0))
    # the guard matters for dimension-less media (binary_files_to_media
    # stubs width/height to 0): np = 0 would hit DIVIDE_BY_ZERO in the
    # patch split under ANSI mode instead of yielding zero patches
    d = img.select(
        "media_id", "txt", "nx", "ny", F.length("txt").alias("n")
    )
    e = d.select(
        "media_id",
        "txt",
        "nx",
        "n",
        (F.col("nx") * F.col("ny")).alias("np"),
        F.explode(
            F.sequence(F.lit(0), F.col("nx") * F.col("ny") - 1)
        ).alias("idx"),
    )
    seg_len = F.expr("((idx + 1) * n) div np - (idx * n) div np")
    seg = F.expr(
        "substring(txt, cast((idx * n) div np + 1 as int), "
        "cast(((idx + 1) * n) div np - (idx * n) div np as int))"
    )
    return (
        e.select(
            "media_id",
            (F.col("idx") % F.col("nx")).cast("int").alias("px"),
            F.expr("idx div nx").cast("int").alias("py"),
            seg_len.cast("int").alias("patch_chars"),
            F.md5(seg).alias("patch_md5"),
        )
        .where(F.col("patch_chars") > 0)
    )


def scene_cuts(media: DataFrame, stride: int = 1) -> DataFrame:
    """Scene-change detection over the sampled frame stream →
    (media_id, n_frames_sampled, n_scenes, cut_frac): a new scene
    starts wherever the frame content hash differs from the previous
    sampled frame — the shot-boundary pass a video-curation pipeline
    runs to drop static/looping clips (n_scenes ≈ 1) and measure
    visual dynamism (cut_frac → 1 means every frame differs).

    Composes over :func:`sample_frames` (the Arrow decode stays the
    stubbed stand-in); the comparison itself is one lag window per
    media — partitioned by media_id, so it parallelizes across clips
    and never shuffles frame payloads, only their 16-byte hashes."""
    from pyspark.sql.window import Window

    frames = sample_frames(media, stride=stride)
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    cuts = frames.withColumn(
        "is_cut",
        (
            F.lag("frame_md5").over(w).isNull()
            | (F.col("frame_md5") != F.lag("frame_md5").over(w))
        ).cast("bigint"),
    )
    return cuts.groupBy("media_id").agg(
        F.count("*").cast("bigint").alias("n_frames_sampled"),
        F.sum("is_cut").cast("bigint").alias("n_scenes"),
        F.round(F.sum("is_cut") / F.count("*"), 6).alias("cut_frac"),
    )


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact media dedup groups → (payload_md5, kind, n_copies,
    keeper_id, total_bytes): byte-identical payloads collapsed by
    content digest, keeper = min media_id. The first pass of any
    image/audio corpus dedup (re-encoded near-dups need perceptual
    hashing — the SimHash/LSH family over decoded features; exact
    digest removes the bulk re-crawls first, exactly like
    textops.dedup.exact_groups does for text).

    Scale: md5 computes JVM-side in the scan (no Python touches the
    payload), one shuffle on the digest; bytes never move — only the
    16-byte digest and the tiny rollup columns."""
    return (
        media.groupBy(
            F.md5(F.col("payload")).alias("payload_md5"),
            F.col("kind"),
        )
        .agg(
            F.count("*").alias("n_copies"),
            F.min("media_id").alias("keeper_id"),
            F.sum(F.length("payload")).alias("total_bytes"),
        )
        .where(F.col("n_copies") >= 2)
        .select(
            "payload_md5",
            "kind",
            F.col("n_copies").cast("bigint").alias("n_copies"),
            F.col("keeper_id").cast("bigint").alias("keeper_id"),
            F.col("total_bytes").cast("bigint").alias("total_bytes"),
        )
    )
