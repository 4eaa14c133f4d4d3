"""Multimodal column plumbing: opaque binary media + typed metadata,
processed with Arrow-batched pandas UDFs (``mapInPandas``).

Container parsing is REAL pure-Python header decode for all three
kinds — 8-bit BMP (image), 8-bit PCM WAV (audio), uncompressed AVI
(video) — via ``make_decoder``/``make_frame_parser``, verified
bit-for-bit by decode(encode(x)) == x against ``encode_media``.
Only the pixel/sample CODEC step (JPEG/H.264/MP3 decompression)
remains out of scope: those libs aren't in this container, so
``decode_stub`` passes unrecognized blobs through deterministically.
Everything Spark-side is real and scale-shaped:

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


def make_decoder():
    """Factory for the REAL container decoder: pure-Python header
    parsing for uncompressed 8-bit BMP (image), 8-bit PCM WAV
    (audio) and uncompressed AVI (video — RIFF walk to the ``movi``
    LIST, per-frame ``00dc``/``00db`` chunk payloads concatenated);
    passthrough for anything without a recognized magic.

    Returned as a fresh closure so worker transforms can capture it
    by VALUE (cloudpickle ships module-level functions by reference,
    which would require this package on every executor's import
    path; a factory-made closure has no importable address, so it
    serializes with its code — same constraint as the nested
    ``_decode`` in :func:`extract_features`).

    BMP: pixel-array offset from the file header (bytes 10-13 LE),
    width/height/bpp from the BITMAPINFOHEADER; rows are 4-byte
    aligned and stored bottom-up, so decode strips padding and
    re-orders top-down — the decoded bytes are exactly the original
    sample stream :func:`encode_media` wrapped. WAV: RIFF chunk walk
    to the ``data`` chunk. AVI: the same RIFF chunk walk (reference
    convention: decode(encode(x)) == x at media.py:68) reaches the
    ``movi`` LIST and concatenates the per-frame video chunk
    payloads in stream order. Malformed headers fall back to
    passthrough rather than raising: a 100 TB crawl always contains
    truncated files, and a narrow map must not kill the job."""
    import struct

    def avi_frames(payload: bytes):
        """Per-frame ``00dc``/``00db`` payloads of a well-formed AVI,
        or None when the container is malformed/truncated (every
        chunk size is bounds-checked against the actual payload
        before any slice, so corrupt headers degrade to passthrough
        instead of allocating from a lying size field)."""
        try:
            if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
                return None
            p = 12
            while p + 8 <= len(payload):
                cid = payload[p : p + 4]
                csz = struct.unpack_from("<I", payload, p + 4)[0]
                if p + 8 + csz > len(payload):
                    return None
                if cid == b"LIST" and payload[p + 8 : p + 12] == b"movi":
                    frames = []
                    q, end = p + 12, p + 8 + csz
                    while q + 8 <= end:
                        fid = payload[q : q + 4]
                        fsz = struct.unpack_from("<I", payload, q + 4)[0]
                        if q + 8 + fsz > end:
                            return None
                        if fid in (b"00dc", b"00db"):
                            frames.append(payload[q + 8 : q + 8 + fsz])
                        q += 8 + fsz + (fsz & 1)  # 2-byte aligned
                    return frames
                p += 8 + csz + (csz & 1)
            return None
        except (struct.error, IndexError):
            return None

    def decode(payload: bytes, kind: str) -> bytes:
        if kind not in ("image", "audio", "video"):
            raise NotImplementedError(f"unknown media kind: {kind}")
        try:
            if kind == "video":
                frames = avi_frames(payload)
                return payload if frames is None else b"".join(frames)
            if kind == "image" and payload[:2] == b"BM" and len(payload) >= 54:
                pixofs = struct.unpack_from("<I", payload, 10)[0]
                width, height = struct.unpack_from("<ii", payload, 18)
                bpp = struct.unpack_from("<H", payload, 28)[0]
                if bpp != 8 or width <= 0 or height == 0:
                    return payload
                rowsize = (width + 3) // 4 * 4
                # A corrupt header can claim a huge height/width; bound the
                # pixel array by the actual payload before allocating, else
                # the passthrough contract fails via OOM instead of a raise.
                if pixofs + abs(height) * rowsize > len(payload):
                    return payload
                rows = [
                    payload[pixofs + r * rowsize : pixofs + r * rowsize + width]
                    for r in range(abs(height))
                ]
                if height > 0:  # bottom-up storage (the common case)
                    rows.reverse()
                return b"".join(rows)
            if (
                kind == "audio"
                and payload[:4] == b"RIFF"
                and payload[8:12] == b"WAVE"
            ):
                p = 12
                while p + 8 <= len(payload):
                    cid = payload[p : p + 4]
                    csz = struct.unpack_from("<I", payload, p + 4)[0]
                    if cid == b"data":
                        # Truncated data chunk: Python slicing would silently
                        # return a short suffix — treat as malformed instead.
                        if p + 8 + csz > len(payload):
                            return payload
                        return payload[p + 8 : p + 8 + csz]
                    p += 8 + csz + (csz & 1)  # chunks are 2-byte aligned
                return payload
        except (struct.error, IndexError):
            return payload
        return payload

    # expose the frame-boundary walk for make_frame_parser (attribute
    # on the closure, so it still ships by value with the function)
    decode.avi_frames = avi_frames
    return decode


def make_frame_parser():
    """Factory for the frame splitter both :func:`extract_features`
    and :func:`sample_frames` use: ``frames(payload, kind,
    n_frames)`` → list of frame byte strings.

    kind='video' with a well-formed AVI yields the REAL per-frame
    chunk payloads from the container (the boundary information a
    raw-byte split destroys and a video pipeline actually needs);
    every other case decodes the container and falls back to the
    deterministic even byte-range split by the metadata frame count —
    the original stand-in geometry, kept for headerless blobs so a
    truncated file still produces features instead of killing the
    map. Fresh-closure factory for the same ship-by-value reason as
    :func:`make_decoder`."""
    _decode = make_decoder()
    _avi_frames = _decode.avi_frames

    def frames(payload: bytes, kind: str, n_frames: int) -> list:
        if kind == "video":
            fr = _avi_frames(payload)
            if fr is not None:
                return fr
        blob = _decode(payload, kind)
        k = max(int(n_frames), 1)
        step = max(len(blob) // k, 1)
        return [blob[i * step : (i + 1) * step] for i in range(k)]

    return frames


#: module-level instance for driver-side use and tests; workers call
#: make_decoder() locally so the closure ships by value.
decode_media = make_decoder()


def encode_media(documents: DataFrame) -> DataFrame:
    """Real-container media synth: the same deterministic media table
    as :func:`synthesize_media` (same kinds, ids, meta) but image
    payloads are genuine 8-bit grayscale BMP files (54-byte header +
    256-entry palette + 4-byte-aligned bottom-up rows), audio
    payloads genuine 8-bit PCM mono WAV files (44-byte RIFF header),
    and video payloads genuine uncompressed AVI containers (RIFF →
    ``hdrl`` LIST with a 56-byte ``avih`` main header → ``movi``
    LIST with one ``00dc`` chunk per frame, 2-byte aligned), each
    wrapping the document's utf-8 bytes as the sample stream. Video
    frames are the BALANCED split of the byte stream into
    meta.n_frames parts (frame i = bytes[(i·n) div k, ((i+1)·n) div
    k) — covers every byte, unlike the truncating even split), so
    concatenating the chunk payloads reproduces the input exactly.

    decode(encode(x)) == x exactly for ALL THREE kinds, so feature
    oracles computed from the source text stay valid while the
    pipeline exercises a REAL header parse — a wrong offset/padding/
    row-order/chunk-walk in the decoder breaks the hash match.
    Arrow-batched narrow map; at 100 TB this step is the ingest
    encoder and runs once."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        def bmp(data: bytes) -> bytes:
            w, h = len(data), 1
            row = data + b"\x00" * ((4 - w % 4) % 4)
            palette = b"".join(
                bytes((v, v, v, 0)) for v in range(256)
            )  # grayscale
            pixofs = 14 + 40 + len(palette)
            header = b"BM" + struct.pack("<IHHI", pixofs + len(row), 0, 0, pixofs)
            dib = struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(row), 2835, 2835, 256, 0
            )
            return header + dib + palette + row

        def wav(data: bytes) -> bytes:
            fmt = struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
            return (
                b"RIFF"
                + struct.pack("<I", 36 + len(data))
                + b"WAVE"
                + b"fmt "
                + fmt
                + b"data"
                + struct.pack("<I", len(data))
                + data
            )

        def avi(frames: list, w: int, h: int) -> bytes:
            # 56-byte MainAVIHeader: µs/frame, rates zeroed; the
            # fields a parser actually reads (dwTotalFrames, dwWidth,
            # dwHeight) are real.
            avih = struct.pack(
                "<14I", 0, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0
            )
            hdrl = (
                b"LIST"
                + struct.pack("<I", 4 + 8 + len(avih))
                + b"hdrl"
                + b"avih"
                + struct.pack("<I", len(avih))
                + avih
            )
            body = b"".join(
                b"00dc"
                + struct.pack("<I", len(fr))
                + fr
                + (b"\x00" if len(fr) & 1 else b"")
                for fr in frames
            )
            movi = b"LIST" + struct.pack("<I", 4 + len(body)) + b"movi" + body
            return (
                b"RIFF"
                + struct.pack("<I", 4 + len(hdrl) + len(movi))
                + b"AVI "
                + hdrl
                + movi
            )

        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                data = r.text.encode("utf-8")
                did = int(r.doc_id)
                kind = ("image", "audio", "video")[did % 3]
                n = int(r.n_chars)
                if kind == "image" and data:
                    payload = bmp(data)
                elif kind == "image":
                    # Empty image: 0-byte passthrough — matches the
                    # mm_container_audit oracle's L=0 image branch and
                    # decode()'s no-magic passthrough. Without this the
                    # video arm below would wrap it in a 108-byte AVI.
                    payload = data
                elif kind == "audio":
                    payload = wav(data)
                else:
                    k, nb = n % 10 + 1, len(data)
                    payload = avi(
                        [
                            data[(i * nb) // k : ((i + 1) * nb) // k]
                            for i in range(k)
                        ],
                        n % 64 + 1,
                        n % 48 + 1,
                    )
                rows.append(
                    {
                        "media_id": did,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": n % 64 + 1,
                            "height": n % 48 + 1,
                            "n_frames": n % 10 + 1,
                        },
                    }
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    # fan_out: the encoder is the heaviest per-row step in the media
    # family, and a small documents parquet arrives as ONE scan task
    # (row-group bound) — every downstream decode/feature op would
    # inherit the single-partition layout through mapInPandas. No-op
    # when the scan is already wide (io/layout.fan_out).
    from ..io.layout import fan_out

    return fan_out(documents.select("doc_id", "text", "n_chars")).mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the opaque payloads:
    byte length, mean byte intensity of the decoded blob, and
    per-frame content hashes (REAL chunk boundaries for AVI video via
    ``make_frame_parser``; even byte-range split by meta.n_frames for
    the single-frame kinds).

    The decode step is the REAL container parse (``make_decoder``:
    BMP/WAV/AVI headers stripped, unrecognized blobs passed through),
    captured by value so the job runs on plain executors with no
    package deployment — cloudpickle would ship a module-level
    function by reference, which requires this package on the
    executor path."""

    _decode = make_decoder()
    _frames = make_frame_parser()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                blob = _decode(bytes(r.payload), r.kind)
                frames = _frames(
                    bytes(r.payload), r.kind, int(r.meta["n_frames"])
                )
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
    blob → one row per kept frame. Frames come from
    ``make_frame_parser``: REAL ``00dc`` chunk boundaries for AVI
    video, decoded-payload even split (same geometry as
    ``extract_features``) for the single-frame kinds and for
    headerless blobs.

    Arrow-batched mapInPandas with a per-row explode in pandas —
    still a narrow map (no shuffle); output rows ≈ input rows ×
    n_frames/stride. At 100 TB this is the decode→sample step before
    a vision encoder."""

    _frames = make_frame_parser()

    def batches(it):
        import hashlib as _hl

        import pandas as _pd

        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                frames = _frames(
                    bytes(r.payload), r.kind, int(r.meta["n_frames"])
                )
                for i in range(0, len(frames), stride):
                    fr = frames[i]
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
    before a downstream encoder. The decode is the REAL RIFF/WAV
    chunk walk (``make_decoder``), so genuine containers from
    ``encode_media`` yield their PCM sample stream; headerless blobs
    pass through. Only kind='audio' rows are framed — the filter is
    JVM-side so parquet prunes the other kinds before Python."""

    _decode = make_decoder()

    def batches(it):
        import hashlib as _hl

        import pandas as _pd

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

    Composes over :func:`sample_frames` (real AVI chunk boundaries
    for video); the comparison itself is one lag window per
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


SIG_SCHEMA = "media_id bigint, kind string, simhash bigint"


def media_signatures(media: DataFrame) -> DataFrame:
    """Perceptual signature per media row → (media_id, kind, simhash):
    a 60-bit bit-majority SimHash over the 256-bin byte histogram of
    the DECODED payload. Container-invariant by construction — a
    re-encode (new header, palette, padding, trailing junk) that
    preserves the sample stream hashes identically, which is exactly
    the class of duplicate :func:`media_dedup`'s exact digest misses
    (media_dedup docstring concedes this; VERDICT r02 item 4).

    Feature hash h_v = first 15 hex chars of md5('mmnd:<v>') as a
    60-bit BIGINT (md5-derived like textops.tokenize.md5_hash60, so
    the DuckDB oracle reproduces it bit-for-bit); vote_j = Σ_v
    count_v·(2·bit_j(h_v)−1); bit j set iff vote_j > 0. Rows with an
    empty decoded payload are dropped (both engines — an all-zero
    signature would otherwise pair every empty blob).

    Scale: narrow Arrow-batched map, numpy bincount + one 256×60
    matmul per row — payload bytes never shuffle, only the 8-byte
    signature leaves the scan. Byte histograms are a coarse feature
    on purpose (CHEAP first-pass screen; the hamming filter is
    exact): same trade as dedup_simhash's shingle features."""

    _decode = make_decoder()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import numpy as _np
        import pandas as _pd

        h = _np.array(
            [
                int(_hl.md5(f"mmnd:{v}".encode()).hexdigest()[:15], 16)
                for v in range(256)
            ],
            dtype=_np.int64,
        )
        # bits[v, j] = bit j of h_v; signs in {-1, +1}
        signs = (
            ((h[:, None] >> _np.arange(60, dtype=_np.int64)[None, :]) & 1) * 2
            - 1
        ).astype(_np.int64)
        powers = _np.int64(1) << _np.arange(60, dtype=_np.int64)

        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                blob = _decode(bytes(r.payload), r.kind)
                if not blob:
                    continue
                counts = _np.bincount(
                    _np.frombuffer(blob, dtype=_np.uint8), minlength=256
                ).astype(_np.int64)
                votes = counts @ signs
                sig = int(((votes > 0) * powers).sum())
                out.append(
                    {"media_id": r.media_id, "kind": r.kind, "simhash": sig}
                )
            yield _pd.DataFrame(
                out, columns=["media_id", "kind", "simhash"]
            )

    return media.mapInPandas(batches, schema=SIG_SCHEMA)


def media_neardup(
    media: DataFrame, max_hamming: int = 3, bucket_cap: int = 256
) -> DataFrame:
    """Perceptual near-dup pairs → (media_a, media_b, kind, hamming):
    same-kind media whose byte-histogram SimHashes differ in ≤
    ``max_hamming`` of 60 bits.

    Candidate generation is the pigeonhole banding of
    textops.dedup.simhash_near_pairs: ≤3 differing bits across 4
    15-bit chunks ⇒ at least one chunk identical, so bucketing on
    (kind, chunk_idx, chunk_value) finds every qualifying pair whose
    bucket survives the cap. Buckets with > ``bucket_cap`` members
    are DROPPED (the high-DF-shingle convention): a signature shared
    by g media yields C(g,2) pairs — quadratic in g by SEMANTICS, not
    by plan — and without the cap a replication-heavy corpus OOMs the
    in-row combo stage (the 10× scale rehearsal found exactly that:
    same-language byte histograms collide into thousand-member
    buckets). Run exact ``media_dedup`` first so byte-identical
    copies never reach this op; the DuckDB oracle mirrors the banding
    and cap exactly, so the gate output stays hash-verifiable.
    Bucket-grouped in-row combos (one pipeline evaluation, one
    chunk-key shuffle), exact hamming filter after. Banding + combos
    live in textops.dedup.simhash_chunk_pairs, shared with the text
    near-dup path — one plan, no drift; the eager localCheckpoint
    there also makes the Python signature map run once (two consumers:
    bucket-count pass + capped semi-join)."""
    from ..textops.dedup import simhash_chunk_pairs

    sig = media_signatures(media)
    cand = simhash_chunk_pairs(
        sig,
        "media_id",
        carry_cols=("kind",),
        key_cols=("kind",),
        bucket_cap=bucket_cap,
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        cand.select(
            F.col("a").alias("media_a"),
            F.col("b").alias("media_b"),
            "kind",
            "sim_a",
            "sim_b",
        )
        .withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("media_a", "media_b", "kind", "hamming")
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


VIDEO_STATS_SCHEMA = (
    "media_id bigint, n_frames int, min_frame_bytes int, "
    "max_frame_bytes int, total_bytes bigint"
)


def video_stats(media: DataFrame) -> DataFrame:
    """Per-video frame-size distribution from the REAL container →
    (media_id, n_frames, min_frame_bytes, max_frame_bytes,
    total_bytes): the first audit a video-curation pipeline runs on a
    crawl (constant-size frames flag synthetic/looping content; a
    zero-byte frame tail flags truncated encodes; total_bytes drives
    storage accounting). Frame boundaries come from the AVI ``00dc``
    chunk walk (make_frame_parser) — a raw byte split cannot see
    them. Narrow Arrow map; only the 5-number summary leaves the
    scan, payloads never shuffle."""

    _frames = make_frame_parser()

    def batches(it):
        import pandas as _pd

        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                frames = _frames(
                    bytes(r.payload), r.kind, int(r.meta["n_frames"])
                )
                sizes = [len(fr) for fr in frames]
                out.append(
                    {
                        "media_id": r.media_id,
                        "n_frames": len(sizes),
                        "min_frame_bytes": min(sizes) if sizes else 0,
                        "max_frame_bytes": max(sizes) if sizes else 0,
                        "total_bytes": sum(sizes),
                    }
                )
            yield _pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "n_frames",
                    "min_frame_bytes",
                    "max_frame_bytes",
                    "total_bytes",
                ],
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        batches, schema=VIDEO_STATS_SCHEMA
    )


AUDIT_ROW_SCHEMA = "kind string, payload_bytes bigint, content_bytes bigint"


def container_audit(media: DataFrame) -> DataFrame:
    """Per-kind container-overhead audit → (kind, n_media,
    payload_bytes, content_bytes, overhead_ratio): measured container
    bytes vs decoded sample-stream bytes — the storage-accounting
    readout that decides when re-encoding a crawl pays for itself.
    The DuckDB oracle recomputes BOTH totals from the documents'
    text lengths via the exact container formulas (BMP header+
    palette+row padding, 44-byte WAV header, AVI RIFF/hdrl/movi chunk
    framing with 2-byte alignment), so a single byte of drift in
    encode_media breaks the hash — the audit IS a bit-level test of
    the codec. Narrow Arrow map emitting two ints per row; rollup is
    JVM-side."""

    _decode = make_decoder()

    def batches(it):
        import pandas as _pd

        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                out.append(
                    {
                        "kind": r.kind,
                        "payload_bytes": len(payload),
                        "content_bytes": len(_decode(payload, r.kind)),
                    }
                )
            yield _pd.DataFrame(
                out, columns=["kind", "payload_bytes", "content_bytes"]
            )

    per_row = media.mapInPandas(batches, schema=AUDIT_ROW_SCHEMA)
    agg = per_row.groupBy("kind").agg(
        F.count("*").cast("bigint").alias("n_media"),
        F.sum("payload_bytes").cast("bigint").alias("payload_bytes"),
        F.sum("content_bytes").cast("bigint").alias("content_bytes"),
    )
    return agg.select(
        "kind",
        "n_media",
        "payload_bytes",
        "content_bytes",
        F.when(
            F.col("payload_bytes") > 0,
            F.round(
                (F.col("payload_bytes") - F.col("content_bytes"))
                / F.col("payload_bytes"),
                6,
            ),
        ).alias("overhead_ratio"),
    )
