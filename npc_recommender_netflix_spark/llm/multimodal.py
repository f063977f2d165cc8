"""§2.9 LLM-data-pipeline: multimodal columns.

Images/audio/video are opaque `binary` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over `mapInPandas`. The container has no codec libs (SURVEY env
constraints), so the decode step is a clearly-marked deterministic fake —
the Spark-side plumbing (binary column, schema, batch iteration, partition
independence) is real and oracle-checked via arithmetic on the byte length.

Scale: mapInPandas streams Arrow batches — constant memory per task, no
row-at-a-time Python. Binary payloads at 100 TB stay out of shuffles
(metadata-only projections after extraction); partition by content id.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import f6, load_table, tables

_NRM = (
    "sqrt(aggregate(embedding, CAST(0 AS DOUBLE),"
    " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)


@register(
    "m_multimodal_join",
    """
    SELECT d.lang, count(*) AS n,
           round(avg(sqrt(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS avg_l2
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY d.lang
    """,
)
def m_multimodal_join(spark, sf_dir):
    """Join the text and vector modalities (doc_id = vec_id, 1:1)."""
    docs, emb = tables(spark, sf_dir, "documents", "embeddings")
    j = docs.join(emb, docs.doc_id == emb.vec_id)
    return j.groupBy("lang").agg(
        F.count("*").alias("n"), f6(F.avg(F.expr(_NRM))).alias("avg_l2")
    )


@register(
    "m_binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS digest
    FROM documents
    """,
)
def m_binary_meta(spark, sf_dir):
    """Opaque binary payload + typed metadata (byte length, content digest)."""
    docs = load_table(spark, sf_dir, "documents")
    bin_col = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        F.octet_length(bin_col).cast("long").alias("n_bytes"),
        F.md5("text").alias("digest"),
    )


_IMG_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, "
    "resized_w long, resized_h long, n_frames long, sampled_frames long, "
    "half_sum_r long"
)


@register(
    "m_image_pipeline",
    """
    WITH spec AS (
        SELECT doc_id,
               octet_length(encode(text)) AS tb,
               octet_length(encode(text)) % 64 + 16 AS w,
               (octet_length(encode(text)) // 64) % 64 + 16 AS h,
               octet_length(encode(text)) % 7 + 1 AS nf
        FROM documents
    ),
    px AS (
        -- decoded-then-2x-downsampled pixels of the SAMPLED frames:
        -- raster[::2, ::2] keeps even (x, y); frames 0 .. min(nf, 4)-1
        SELECT s.doc_id, s.w, s.h, s.nf, s.tb,
               (s.doc_id + 3 * gx.x + 7 * gy.y + 13 * gf.f) % 256 AS r
        FROM spec s,
             generate_series(0, 78, 2) AS gx(x),
             generate_series(0, 78, 2) AS gy(y),
             generate_series(0, 3) AS gf(f)
        WHERE gx.x < s.w AND gy.y < s.h AND gf.f < least(s.nf, 4)
    )
    SELECT doc_id,
           CAST(nf * (9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
                      + 3 * w * h) AS BIGINT) AS n_bytes,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST((w + 1) // 2 AS BIGINT) AS resized_w,
           CAST((h + 1) // 2 AS BIGINT) AS resized_h,
           CAST(nf AS BIGINT) AS n_frames,
           CAST(least(nf, 4) AS BIGINT) AS sampled_frames,
           CAST(sum(r) AS BIGINT) AS half_sum_r
    FROM px
    GROUP BY doc_id, w, h, nf, tb
    """,
)
def m_image_pipeline(spark, sf_dir):
    """Decode -> resize -> frame-sample over a binary column via mapInPandas
    (Arrow batches), on REAL image bytes end to end (round-9 verdict item
    6: this key used to stub-decode while m_ppm_decode parsed real bytes).

    Stage 1 synthesizes, per document, a genuine multi-frame P6 PPM stream
    — one real ASCII header + interleaved RGB raster per frame,
    concatenated — with geometry derived from the document's byte length
    (w = tb%64+16, h = (tb//64)%64+16, n_frames = tb%7+1) and pixel
    content linear-congruential in (doc_id, x, y, frame), so the DuckDB
    oracle can recompute every statistic from the generator formula
    without seeing the bytes. Stage 2 is the REAL pipeline: a P6 header
    tokenizer walks the concatenated stream frame by frame (counting
    n_frames from the bytes, not the spec), frame-samples the first
    min(4, nf) frames, 2x nearest-neighbor downsamples each DECODED
    raster (raster[::2, ::2] — resized_w/h are the actual half-raster
    shape, (w+1)//2), and sums the downsampled red channel across sampled
    frames (half_sum_r): a changed pixel changes the output. Only the
    pixel CONTENT is synthetic — the container ships no image codecs
    (SURVEY env constraints), and P6 is the codec-free interchange format.

    Scale: both stages are one chained mapInPandas — payload bytes are
    born and die inside the same scan-side Arrow task, never shuffled;
    only fixed-width decoded metadata flows on (the m_ppm_decode /
    m_wav_decode 100 TB shape).
    """
    import numpy as np

    # Defined inside the query fn so cloudpickle ships it by value (executor
    # Python workers cannot import this package).
    def synth_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Real multi-frame P6 stream per doc; geometry from the TEXT byte
        length, pixels linear-congruential in (doc_id, x, y, frame)."""
        for pdf in batches:
            payloads = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = int(doc_id)
                tb = len(bytes(payload))
                w, h, nf = tb % 64 + 16, (tb // 64) % 64 + 16, tb % 7 + 1
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                frames = []
                for f in range(nf):
                    r = (d + 3 * x + 7 * y + 13 * f) % 256
                    g = (2 * d + 5 * x + y + 17 * f) % 256
                    b = (3 * d + x + 11 * y + 19 * f) % 256
                    raster = np.stack(
                        np.broadcast_arrays(r, g, b), axis=-1
                    ).astype(np.uint8)
                    frames.append(
                        f"P6\n{w} {h}\n255\n".encode() + raster.tobytes()
                    )
                payloads.append(b"".join(frames))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode_pipeline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """REAL P6 stream parser + frame sampler + 2x downsample: all
        output statistics come from DECODED pixels/headers."""
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_bytes", "width", "height", "resized_w",
                "resized_h", "n_frames", "sampled_frames", "half_sum_r",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                pos, n_frames, half_sum_r = 0, 0, 0
                width = height = rw = rh = None
                while pos < len(buf):
                    assert buf[pos : pos + 2] == b"P6", "not a P6 frame"
                    fields, p = [], pos + 2
                    while len(fields) < 3:
                        while buf[p] in b" \t\r\n":
                            p += 1
                        start = p
                        while buf[p] not in b" \t\r\n":
                            p += 1
                        fields.append(int(buf[start:p]))
                    p += 1  # single whitespace after maxval, then raster
                    w, h, maxval = fields
                    assert maxval == 255, "unsupported maxval"
                    raster = np.frombuffer(
                        buf, dtype=np.uint8, count=3 * w * h, offset=p
                    ).reshape(h, w, 3)
                    if n_frames < 4:  # frame sampling: first min(4, nf)
                        half = raster[::2, ::2].astype(np.int64)
                        rw, rh = half.shape[1], half.shape[0]
                        half_sum_r += int(half[:, :, 0].sum())
                    width, height = w, h
                    n_frames += 1
                    pos = p + 3 * w * h
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(buf))
                out["width"].append(width)
                out["height"].append(height)
                out["resized_w"].append(rw)
                out["resized_h"].append(rh)
                out["n_frames"].append(n_frames)
                out["sampled_frames"].append(min(n_frames, 4))
                out["half_sum_r"].append(half_sum_r)
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select("doc_id", F.col("text").cast("binary").alias("payload"))
    frames = payload.mapInPandas(synth_frames, schema="doc_id long, payload binary")
    return frames.mapInPandas(decode_pipeline, schema=_IMG_SCHEMA)


_AUD_SCHEMA = (
    "doc_id long, n_bytes long, sample_rate long, n_samples long, "
    "duration_ms long, resampled_rate long, resampled_samples long"
)


@register(
    "m_audio_pipeline",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(8000 + (octet_length(encode(text)) % 3) * 4000 AS BIGINT) AS sample_rate,
           CAST(octet_length(encode(text)) * 4 AS BIGINT) AS n_samples,
           CAST(octet_length(encode(text)) * 4 * 1000
                // (8000 + (octet_length(encode(text)) % 3) * 4000) AS BIGINT) AS duration_ms,
           CAST(16000 AS BIGINT) AS resampled_rate,
           CAST(octet_length(encode(text)) * 4 * 16000
                // (8000 + (octet_length(encode(text)) % 3) * 4000) AS BIGINT) AS resampled_samples
    FROM documents
    """,
)
def m_audio_pipeline(spark, sf_dir):
    """Decode -> resample over an audio-typed binary column via mapInPandas —
    the audio twin of m_image_pipeline. Decode is a deterministic stub (no
    audio codecs in this container): sample rate and sample count derive
    from the byte length; duration and 16 kHz resampling are integer
    arithmetic the oracle mirrors exactly. The Arrow batch shape, schema,
    and per-row independence (no shuffle; payloads never leave the scan
    task) are the real 100 TB plumbing.
    """
    # Defined inside the query fn so cloudpickle ships it by value.
    def fake_decode_audio(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """STUB decode: a real implementation would run an audio codec
        (soundfile/ffmpeg) on `payload`; dimensions derive from byte length
        instead. Integer arithmetic only — float sample math would not be
        engine-stable."""
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            rate = 8000 + (n_bytes % 3) * 4000
            n_samples = n_bytes * 4
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "sample_rate": rate,
                    "n_samples": n_samples,
                    "duration_ms": n_samples * 1000 // rate,
                    "resampled_rate": 16000,
                    "resampled_samples": n_samples * 16000 // rate,
                }
            )

    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(fake_decode_audio, schema=_AUD_SCHEMA)


_VID_SCHEMA = (
    "doc_id long, n_bytes long, fps long, n_frames long, "
    "duration_ms long, keyframe_every long, sampled_frames long"
)


@register(
    "m_video_pipeline",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 24 + 6 AS BIGINT) AS fps,
           CAST(octet_length(encode(text)) % 97 + 24 AS BIGINT) AS n_frames,
           CAST((octet_length(encode(text)) % 97 + 24) * 1000
                // (octet_length(encode(text)) % 24 + 6) AS BIGINT) AS duration_ms,
           CAST((octet_length(encode(text)) % 24 + 6) * 2 AS BIGINT) AS keyframe_every,
           CAST((octet_length(encode(text)) % 97 + 24
                 + octet_length(encode(text)) % 24 + 6 - 1)
                // (octet_length(encode(text)) % 24 + 6) AS BIGINT) AS sampled_frames
    FROM documents
    """,
)
def m_video_pipeline(spark, sf_dir):
    """Demux -> frame-sample over a video-typed binary column via mapInPandas
    — the video leg of the multimodal triple (image / audio / video).
    Decode is a deterministic stub (no ffmpeg in this container): fps and
    frame count derive from byte length; duration and 1-frame-per-second
    sampling (ceil(n_frames / fps)) are integer arithmetic the oracle
    mirrors exactly. As with image/audio, payload bytes never leave the
    scan task — only typed metadata flows downstream.
    """
    # Defined inside the query fn so cloudpickle ships it by value.
    def fake_demux_video(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """STUB demux: a real implementation would run a container demuxer +
        codec (ffmpeg) on `payload`; stream properties derive from byte
        length instead. Integer arithmetic only, mirrored by the oracle."""
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            fps = (n_bytes % 24) + 6
            n_frames = (n_bytes % 97) + 24
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "fps": fps,
                    "n_frames": n_frames,
                    "duration_ms": n_frames * 1000 // fps,
                    "keyframe_every": fps * 2,
                    # sample at 1 fps: ceil(n_frames / fps) frames kept
                    "sampled_frames": (n_frames + fps - 1) // fps,
                }
            )

    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(fake_demux_video, schema=_VID_SCHEMA)


_FRAME_SCHEMA = "doc_id long, frame_idx long, frame_content string"


@register(
    "m_frame_dedup",
    """
    WITH frames AS (
        SELECT d.doc_id, g.i AS frame_idx,
               substr(d.text,
                      1 + ((g.i * 7) % greatest(d.n_chars - 15, 1)),
                      16) AS frame_content
        FROM documents d, generate_series(0, 14, 2) AS g(i)
        WHERE g.i < (d.n_chars % 13) + 3
    ),
    hashed AS (
        SELECT doc_id, frame_idx, md5(frame_content) AS fhash FROM frames
    ),
    cross_doc AS (
        SELECT fhash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM hashed GROUP BY fhash
    )
    SELECT h.doc_id,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(count(DISTINCT h.fhash) AS BIGINT) AS n_unique,
           CAST(sum(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared
    FROM hashed h JOIN cross_doc c ON c.fhash = h.fhash
    GROUP BY h.doc_id
    ORDER BY n_shared DESC, h.doc_id LIMIT 50
    """,
)
def m_frame_dedup(spark, sf_dir):
    """Video-frame near-dup screen: sample keyframes per clip (every 2nd
    frame), fingerprint each frame, and count per-clip frames whose
    fingerprint also appears in ANOTHER clip — the cross-video dedup a
    multimodal corpus runs to kill re-uploads and intro/outro
    boilerplate before training.

    Frame extraction runs in Arrow-batched `mapInPandas` (the real
    plumbing: payload in, per-frame rows out, constant memory per task
    — a real decoder would emit pixel-hash fingerprints; this STUB
    derives frame content from text slices so the oracle can mirror it
    exactly). Fingerprinting is JVM md5 AFTER extraction, so what
    shuffles is (doc, idx, 32-char hash) — never payloads. The
    cross-clip census groups by fhash (uniform md5 keys, no skew), and
    the per-clip rollup joins it back hash-keyed: the exact
    t_exact_dedup_digest shape, frames instead of docs.
    """
    # Defined inside the query fn so cloudpickle ships it by value.
    def extract_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """STUB frame sampler: a real one would demux video and decode
        every 2nd keyframe; here frame i's content is a deterministic
        16-char slice at offset (i*7) mod max(n_chars-15, 1)."""
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_content": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n_chars = len(text)
                n_frames = (n_chars % 13) + 3
                span = max(n_chars - 15, 1)
                for i in range(0, min(n_frames, 15), 2):
                    start = (i * 7) % span
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_content"].append(text[start : start + 16])
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frames = docs.mapInPandas(extract_frames, schema=_FRAME_SCHEMA)
    hashed = frames.select(
        "doc_id", "frame_idx", F.md5("frame_content").alias("fhash")
    )
    cross_doc = hashed.groupBy("fhash").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    return (
        hashed.join(cross_doc, "fhash")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.countDistinct("fhash").cast("long").alias("n_unique"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared"),
        )
        .orderBy(F.col("n_shared").desc(), "doc_id")
        .limit(50)
    )


_ROUTE_SCHEMA = "doc_id long, modality string, n_bytes long, feature long"


@register(
    "m_modality_router",
    """
    WITH routed AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image'
                               WHEN 1 THEN 'audio'
                               ELSE 'video' END AS modality,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CASE doc_id % 3
                 WHEN 0 THEN CAST(octet_length(encode(text)) % 4096 AS BIGINT)
                 WHEN 1 THEN CAST(octet_length(encode(text)) * 4 AS BIGINT)
                 ELSE CAST(octet_length(encode(text)) % 97 + 24 AS BIGINT)
               END AS feature
        FROM documents
    )
    SELECT modality, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(sum(feature) AS BIGINT) AS feature_sum
    FROM routed GROUP BY modality ORDER BY modality
    """,
)
def m_modality_router(spark, sf_dir):
    """Mixed-modality dispatch: one binary corpus routed by detected
    type into per-modality decode branches (image / audio / video),
    re-unioned into a single typed feature table — the top-of-funnel
    architecture for a multimodal training pipeline where one ingest
    stream carries every payload kind. Detection is doc_id mod 3 (a
    deterministic stand-in for magic-byte sniffing); each branch runs
    its own Arrow `mapInPandas` extractor, as m_image/audio/video do.

    The router is three codegen FILTERS off one scan — no shuffle to
    split, and each branch's mapInPandas sees only its slice.
    unionByName re-assembles lazily (union is not a shuffle), and the
    modality census is one partial+final agg over 3 cells. At 100 TB
    you'd write each branch to its own partition layout; the plan
    shape (scan → filter → Arrow extract → union → agg) is unchanged.
    """
    # Defined inside the query fn so cloudpickle ships them by value.
    def _branch(modality):
        def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                n_bytes = pdf["payload"].map(len)
                if modality == "image":
                    feature = n_bytes % 4096
                elif modality == "audio":
                    feature = n_bytes * 4
                else:
                    feature = n_bytes % 97 + 24
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "modality": modality,
                        "n_bytes": n_bytes,
                        "feature": feature,
                    }
                )

        return extract

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    branches = []
    for i, modality in enumerate(["image", "audio", "video"]):
        sliced = docs.where(F.col("doc_id") % 3 == i)
        branches.append(sliced.mapInPandas(_branch(modality), schema=_ROUTE_SCHEMA))
    routed = branches[0].unionByName(branches[1]).unionByName(branches[2])
    return (
        routed.groupBy("modality")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum("feature").cast("long").alias("feature_sum"),
        )
        .orderBy("modality")
    )


_WAV_SCHEMA = (
    "doc_id long, n_bytes long, sample_rate long, n_channels long, "
    "bits_per_sample long, n_samples long, duration_ms long, "
    "peak_abs long, sum_abs long"
)


@register(
    "m_wav_decode",
    """
    WITH spec AS (
        SELECT doc_id,
               (doc_id % 50) + 20 AS n,
               8000 + (doc_id % 3) * 4000 AS rate
        FROM documents
    ),
    samples AS (
        SELECT s.doc_id, s.n, s.rate,
               ((s.doc_id * 31 + g.i * 17) % 65536) - 32768 AS v
        FROM spec s, generate_series(0, 69) AS g(i)
        WHERE g.i < s.n
    )
    SELECT doc_id,
           CAST(44 + 2 * n AS BIGINT) AS n_bytes,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(1 AS BIGINT) AS n_channels,
           CAST(16 AS BIGINT) AS bits_per_sample,
           CAST(n AS BIGINT) AS n_samples,
           CAST(n * 1000 // rate AS BIGINT) AS duration_ms,
           CAST(max(abs(v)) AS BIGINT) AS peak_abs,
           CAST(sum(abs(v)) AS BIGINT) AS sum_abs
    FROM samples
    GROUP BY doc_id, n, rate
    """,
)
def m_wav_decode(spark, sf_dir):
    """REAL audio decode, end to end: each doc becomes a genuine RIFF/WAVE
    PCM16 file (real 44-byte header, little-endian sample frames), and a
    SECOND Arrow stage parses those bytes back with a real chunk-walking
    RIFF reader — magic checks, fmt-chunk field decode, data-chunk sample
    extraction via numpy frombuffer. Unlike the m_audio_pipeline stub
    (honest about having no codec), nothing here derives from byte length:
    every output field is read out of the decoded container or computed
    from the decoded PCM samples, so a flipped byte in the header or
    payload would change the result. Only the audio CONTENT is synthetic
    (a deterministic integer waveform), which is what lets the oracle
    recompute peak/energy independently from the generator formula.

    Scale shape: synth and decode are both mapInPandas over the same
    partitioning — payload bytes never shuffle (the only exchange is the
    zero-row barrier-free pass-through), and each task holds one Arrow
    batch of small blobs. With real ingested audio the synth stage is
    replaced by the blob-store scan; the decode stage is unchanged.
    """
    import struct

    import numpy as np

    # Both stages defined inside the query fn so cloudpickle ships them by
    # value (executor workers cannot import this package).
    def synth_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Write a REAL wav file per doc: RIFF header + PCM16 mono data.
        Waveform sample i = ((doc_id*31 + i*17) % 65536) - 32768."""
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = (d % 50) + 20
                rate = 8000 + (d % 3) * 4000
                samples = ((d * 31 + np.arange(n) * 17) % 65536 - 32768).astype(
                    "<i2"
                )
                data = samples.tobytes()
                hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                fmt = b"fmt " + struct.pack(
                    "<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16
                )
                payloads.append(hdr + fmt + b"data" + struct.pack("<I", len(data)) + data)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """REAL RIFF parser: chunk walk, fmt decode, PCM16 extraction."""
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_bytes", "sample_rate", "n_channels",
                "bits_per_sample", "n_samples", "duration_ms", "peak_abs",
                "sum_abs",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                assert buf[0:4] == b"RIFF" and buf[8:12] == b"WAVE", "not a WAV"
                pos, rate, channels, bits, data = 12, None, None, None, None
                while pos + 8 <= len(buf):
                    cid = buf[pos: pos + 4]
                    (clen,) = struct.unpack("<I", buf[pos + 4: pos + 8])
                    body = buf[pos + 8: pos + 8 + clen]
                    if cid == b"fmt ":
                        audio_fmt, channels, rate, _, _, bits = struct.unpack(
                            "<HHIIHH", body[:16]
                        )
                        assert audio_fmt == 1, "not PCM"
                    elif cid == b"data":
                        data = body
                    pos += 8 + clen + (clen & 1)  # RIFF chunks pad to even
                samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                n = len(samples) // channels
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(buf))
                out["sample_rate"].append(rate)
                out["n_channels"].append(channels)
                out["bits_per_sample"].append(bits)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000 // rate)
                out["peak_abs"].append(int(np.abs(samples).max()))
                out["sum_abs"].append(int(np.abs(samples).sum()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    wavs = docs.mapInPandas(synth_wav, schema="doc_id long, payload binary")
    return wavs.mapInPandas(decode_wav, schema=_WAV_SCHEMA)


_PPM_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, "
    "sum_r long, sum_g long, sum_b long, "
    "half_w long, half_h long, half_sum_r long"
)


@register(
    "m_ppm_decode",
    """
    WITH spec AS (
        SELECT doc_id,
               (doc_id % 20) + 8 AS w,
               (doc_id % 12) + 6 AS h
        FROM documents
    ),
    px AS (
        SELECT s.doc_id, s.w, s.h, gx.x, gy.y,
               (s.doc_id + 3 * gx.x + 7 * gy.y) % 256 AS r,
               (2 * s.doc_id + 5 * gx.x + gy.y) % 256 AS g,
               (3 * s.doc_id + gx.x + 11 * gy.y) % 256 AS b
        FROM spec s, generate_series(0, 27) AS gx(x), generate_series(0, 17) AS gy(y)
        WHERE gx.x < s.w AND gy.y < s.h
    )
    SELECT doc_id,
           CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
                + 3 * w * h AS BIGINT) AS n_bytes,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b,
           CAST((w + 1) // 2 AS BIGINT) AS half_w,
           CAST((h + 1) // 2 AS BIGINT) AS half_h,
           CAST(sum(CASE WHEN x % 2 = 0 AND y % 2 = 0 THEN r END) AS BIGINT)
               AS half_sum_r
    FROM px
    GROUP BY doc_id, w, h
    """,
)
def m_ppm_decode(spark, sf_dir):
    """REAL image decode, end to end: each doc becomes a genuine binary
    PPM (P6) image — real ASCII header, real interleaved RGB raster — and
    a second Arrow stage parses the bytes back with a real P6 reader
    (header tokenizer handling arbitrary whitespace, maxval check, numpy
    raster reshape), then computes channel statistics from DECODED pixels
    and a genuine 2x nearest-neighbor downsample (raster[::2, ::2]) — the
    resize step m_image_pipeline could only pantomime. A corrupted header
    or truncated raster raises; a changed pixel changes the sums. Only
    the pixel CONTENT is synthetic (deterministic per (doc_id, x, y)),
    so the oracle recomputes the statistics from the generator formula
    without ever seeing the bytes.

    Same 100 TB shape as m_wav_decode: blob bytes live and die inside
    the scan-side Arrow tasks; only decoded metadata flows on.
    """
    import numpy as np

    def synth_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Write a REAL P6 file per doc: pixel (x, y) channel values are
        linear-congruential in (doc_id, x, y) mod 256."""
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = (d % 20) + 8, (d % 12) + 6
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                r = (d + 3 * x + 7 * y) % 256
                g = (2 * d + 5 * x + y) % 256
                b = (3 * d + x + 11 * y) % 256
                raster = np.stack(
                    np.broadcast_arrays(r, g, b), axis=-1
                ).astype(np.uint8)
                payloads.append(f"P6\n{w} {h}\n255\n".encode() + raster.tobytes())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """REAL P6 parser: whitespace-tokenized header, raster reshape,
        stats + 2x nearest-neighbor downsample from decoded pixels."""
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_bytes", "width", "height", "sum_r", "sum_g",
                "sum_b", "half_w", "half_h", "half_sum_r",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                assert buf[0:2] == b"P6", "not a P6 PPM"
                # header = magic + 3 whitespace-separated ints, then raster
                fields, pos = [], 2
                while len(fields) < 3:
                    while buf[pos] in b" \t\r\n":
                        pos += 1
                    start = pos
                    while buf[pos] not in b" \t\r\n":
                        pos += 1
                    fields.append(int(buf[start:pos]))
                pos += 1  # single whitespace after maxval, then raster
                w, h, maxval = fields
                assert maxval == 255, "unsupported maxval"
                raster = np.frombuffer(
                    buf, dtype=np.uint8, count=3 * w * h, offset=pos
                ).reshape(h, w, 3).astype(np.int64)
                half = raster[::2, ::2]
                out["doc_id"].append(doc_id)
                out["n_bytes"].append(len(buf))
                out["width"].append(w)
                out["height"].append(h)
                out["sum_r"].append(int(raster[:, :, 0].sum()))
                out["sum_g"].append(int(raster[:, :, 1].sum()))
                out["sum_b"].append(int(raster[:, :, 2].sum()))
                out["half_w"].append(half.shape[1])
                out["half_h"].append(half.shape[0])
                out["half_sum_r"].append(int(half[:, :, 0].sum()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ppms = docs.mapInPandas(synth_ppm, schema="doc_id long, payload binary")
    return ppms.mapInPandas(decode_ppm, schema=_PPM_SCHEMA)


_PNG_SCHEMA = (
    "doc_id long, width long, height long, bit_depth long, color_type long, "
    "n_chunks long, sum_r long, sum_g long, sum_b long, half_sum_g long"
)


@register(
    "m_png_decode",
    """
    WITH spec AS (
        SELECT doc_id,
               (doc_id % 16) + 8 AS w,
               (doc_id % 10) + 5 AS h
        FROM documents
    ),
    px AS (
        SELECT s.doc_id, s.w, s.h, gx.x, gy.y,
               (5 * s.doc_id + 2 * gx.x + 3 * gy.y) % 256 AS r,
               (s.doc_id + 4 * gx.x + 9 * gy.y) % 256 AS g,
               (7 * s.doc_id + gx.x + 6 * gy.y) % 256 AS b
        FROM spec s, generate_series(0, 23) AS gx(x), generate_series(0, 14) AS gy(y)
        WHERE gx.x < s.w AND gy.y < s.h
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(8 AS BIGINT) AS bit_depth,
           CAST(2 AS BIGINT) AS color_type,
           CAST(3 AS BIGINT) AS n_chunks,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b,
           CAST(sum(CASE WHEN x % 2 = 0 AND y % 2 = 0 THEN g END) AS BIGINT)
               AS half_sum_g
    FROM px
    GROUP BY doc_id, w, h
    """,
)
def m_png_decode(spark, sf_dir):
    """REAL compressed-image decode, end to end: each doc becomes a
    genuine PNG — 8-byte signature, IHDR, one zlib-DEFLATE IDAT whose
    scanlines rotate through ALL FIVE PNG filter types (None/Sub/Up/
    Average/Paeth, type = (doc_id+y) % 5), IEND, and a real CRC-32 on
    every chunk — and a second Arrow stage decodes it back with a real
    PNG reader: signature + per-chunk CRC verification, IHDR field
    decode, zlib inflate, and a full filter-inverse pass (Sub/Average/
    Paeth reconstruct sequentially against the prior byte and prior
    scanline, exactly per the PNG spec). This upgrades the image path
    from container parsing (m_ppm_decode's uncompressed P6) to a real
    COMPRESSED codec: a flipped bit anywhere — header, filter byte,
    compressed stream, CRC — either changes the decoded sums or raises.
    zlib is stdlib, so no codec-library stub is needed. Channel sums and
    a 2x nearest-neighbor downsample are computed from DECODED pixels;
    only the pixel CONTENT is synthetic (deterministic in (doc_id, x,
    y)), which is what lets the oracle recompute the statistics from the
    generator formula without seeing the bytes.

    Same 100 TB shape as m_wav_decode/m_ppm_decode: compressed blobs
    live and die inside scan-side Arrow tasks (mapInPandas twice over
    the same partitioning — no payload shuffle); only decoded metadata
    flows on. With real ingested PNGs the synth stage is replaced by the
    blob-store scan and the decode stage is unchanged.
    """
    import struct
    import zlib

    import numpy as np

    def _paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def _chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    def synth_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Write a REAL PNG per doc: RGB8, one IDAT, filters rotate 0-4."""
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = (d % 16) + 8, (d % 10) + 5
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                r = (5 * d + 2 * x + 3 * y) % 256
                g = (d + 4 * x + 9 * y) % 256
                b = (7 * d + x + 6 * y) % 256
                raster = np.stack(
                    np.broadcast_arrays(r, g, b), axis=-1
                ).astype(np.uint8)
                filtered = bytearray()
                prior = bytes(w * 3)
                for yy in range(h):
                    raw = raster[yy].tobytes()
                    f = (d + yy) % 5
                    filtered.append(f)
                    for i in range(w * 3):
                        left = raw[i - 3] if i >= 3 else 0
                        up = prior[i]
                        ul = prior[i - 3] if i >= 3 else 0
                        if f == 0:
                            pred = 0
                        elif f == 1:
                            pred = left
                        elif f == 2:
                            pred = up
                        elif f == 3:
                            pred = (left + up) // 2
                        else:
                            pred = _paeth(left, up, ul)
                        filtered.append((raw[i] - pred) % 256)
                    prior = raw
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
                payloads.append(
                    b"\x89PNG\r\n\x1a\n"
                    + _chunk(b"IHDR", ihdr)
                    + _chunk(b"IDAT", zlib.compress(bytes(filtered)))
                    + _chunk(b"IEND", b"")
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode_png(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """REAL PNG reader: CRC-verified chunk walk, inflate, unfilter."""
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "width", "height", "bit_depth", "color_type",
                "n_chunks", "sum_r", "sum_g", "sum_b", "half_sum_g",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                assert buf[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
                pos, idat, n_chunks = 8, b"", 0
                w = h = depth = ctype_ihdr = None
                while pos < len(buf):
                    (clen,) = struct.unpack(">I", buf[pos: pos + 4])
                    ctype = buf[pos + 4: pos + 8]
                    body = buf[pos + 8: pos + 8 + clen]
                    (crc,) = struct.unpack(
                        ">I", buf[pos + 8 + clen: pos + 12 + clen]
                    )
                    assert crc == (zlib.crc32(ctype + body) & 0xFFFFFFFF), (
                        "CRC mismatch"
                    )
                    n_chunks += 1
                    if ctype == b"IHDR":
                        w, h, depth, ctype_ihdr = struct.unpack(
                            ">IIBB", body[:10]
                        )
                        assert depth == 8 and ctype_ihdr == 2, "unsupported"
                    elif ctype == b"IDAT":
                        idat += body
                    elif ctype == b"IEND":
                        break
                    pos += 12 + clen
                filtered = zlib.decompress(idat)
                stride = w * 3
                assert len(filtered) == h * (1 + stride), "bad raster size"
                recon = bytearray()
                prior = bytes(stride)
                for yy in range(h):
                    f = filtered[yy * (1 + stride)]
                    row_f = filtered[
                        yy * (1 + stride) + 1: (yy + 1) * (1 + stride)
                    ]
                    row = bytearray(stride)
                    for i in range(stride):
                        left = row[i - 3] if i >= 3 else 0
                        up = prior[i]
                        ul = prior[i - 3] if i >= 3 else 0
                        if f == 0:
                            pred = 0
                        elif f == 1:
                            pred = left
                        elif f == 2:
                            pred = up
                        elif f == 3:
                            pred = (left + up) // 2
                        elif f == 4:
                            pred = _paeth(left, up, ul)
                        else:
                            raise AssertionError(f"bad filter {f}")
                        row[i] = (row_f[i] + pred) % 256
                    recon += row
                    prior = bytes(row)
                raster = np.frombuffer(bytes(recon), dtype=np.uint8).reshape(
                    h, w, 3
                ).astype(np.int64)
                half = raster[::2, ::2]
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["bit_depth"].append(depth)
                out["color_type"].append(ctype_ihdr)
                out["n_chunks"].append(n_chunks)
                out["sum_r"].append(int(raster[:, :, 0].sum()))
                out["sum_g"].append(int(raster[:, :, 1].sum()))
                out["sum_b"].append(int(raster[:, :, 2].sum()))
                out["half_sum_g"].append(int(half[:, :, 1].sum()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pngs = docs.mapInPandas(synth_png, schema="doc_id long, payload binary")
    return pngs.mapInPandas(decode_png, schema=_PNG_SCHEMA)


@register(
    "m_checksum_audit",
    """
    WITH feed AS (
        SELECT doc_id,
               md5(text) AS stored_checksum,
               CASE WHEN doc_id % 97 = 0 THEN text || '!'
                    ELSE text END AS payload
        FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_payloads,
           CAST(sum(CASE WHEN md5(payload) <> stored_checksum
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
           CAST(min(CASE WHEN md5(payload) <> stored_checksum
                         THEN doc_id END) AS BIGINT) AS first_corrupt_id
    FROM feed
    """,
)
def m_checksum_audit(spark, sf_dir):
    """Payload integrity audit: recompute each binary payload's
    checksum and compare against the stored one — the bit-rot /
    truncated-upload scan every blob store needs before payloads feed
    decoders (a corrupted image crashes the m_image_pipeline worker at
    hour six; this catches it in the manifest pass). Every 97th
    payload is deterministically corrupted in-flight (one appended
    byte) and the audit must count exactly those.

    Both checksums are map-side md5 over the scan — no shuffle until
    the 3-counter rollup; at 100 TB this is a pure linear pass whose
    output is three numbers and a first-offender id for triage. The
    stored checksum would normally come from the ingest manifest; the
    recompute-and-compare plan shape is identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    feed = docs.select(
        "doc_id",
        F.md5("text").alias("stored_checksum"),
        F.when(
            F.col("doc_id") % 97 == 0, F.concat(F.col("text"), F.lit("!"))
        )
        .otherwise(F.col("text"))
        .alias("payload"),
    )
    bad = F.md5("payload") != F.col("stored_checksum")
    return feed.agg(
        F.count("*").cast("long").alias("n_payloads"),
        F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_corrupt"),
        F.min(F.when(bad, F.col("doc_id"))).cast("long").alias("first_corrupt_id"),
    )


_TIFF_SCHEMA = (
    "doc_id long, byte_order string, n_entries long, width long, "
    "height long, orientation long, dt_day long"
)


@register(
    "m_tiff_ifd",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
           CAST(4 AS BIGINT) AS n_entries,
           CAST((doc_id % 16) + 8 AS BIGINT) AS width,
           CAST((doc_id % 10) + 5 AS BIGINT) AS height,
           CAST(1 + doc_id % 8 AS BIGINT) AS orientation,
           CAST(1 + doc_id % 28 AS BIGINT) AS dt_day
    FROM documents ORDER BY doc_id
    """,
)
def m_tiff_ifd(spark, sf_dir):
    """REAL TIFF/EXIF metadata decode: each doc becomes a genuine
    minimal TIFF — magic 42, IFD0 with four entries (ImageWidth 256,
    ImageLength 257, Orientation 274, DateTime 306 as an out-of-line
    ASCII value reached through its offset field), and, crucially,
    ALTERNATING byte order per document ('II' little-endian / 'MM'
    big-endian by doc parity) — and a second Arrow stage parses it
    back with a real IFD walker that must honor the byte-order mark
    for every field it reads (the classic EXIF-parser bug is exactly
    getting one endianness path wrong; here half the corpus exercises
    each). Value fields are left-justified SHORTs per the TIFF 6.0
    spec; the DateTime string is parsed from its offset, not inlined.

    Completes the container family (RIFF/WAV chunks, P6 raster, PNG
    chunks+DEFLATE) with the OFFSET-DIRECTORY layout class that TIFF/
    EXIF/ORC-footer formats share. Same 100 TB shape: payloads live
    and die inside scan-side mapInPandas tasks, only decoded metadata
    flows on; the oracle recomputes every field from the generator
    formula without seeing bytes.
    """
    import struct

    def synth_tiff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                e = "<" if d % 2 == 0 else ">"
                bom = b"II" if d % 2 == 0 else b"MM"
                w, h = (d % 16) + 8, (d % 10) + 5
                ori = 1 + d % 8
                day = 1 + d % 28
                dt = f"2024:01:{day:02d} 12:00:00\x00".encode()
                # header(8) + count(2) + 4 entries(48) + next(4) = 62
                dt_off = 62
                def entry(tag, typ, cnt, val4):
                    return struct.pack(e + "HHI", tag, typ, cnt) + val4
                short = lambda v: struct.pack(e + "HH", v, 0)
                ifd = (
                    struct.pack(e + "H", 4)
                    + entry(256, 3, 1, short(w))
                    + entry(257, 3, 1, short(h))
                    + entry(274, 3, 1, short(ori))
                    + entry(306, 2, len(dt), struct.pack(e + "I", dt_off))
                    + struct.pack(e + "I", 0)
                )
                payloads.append(
                    bom + struct.pack(e + "H", 42) + struct.pack(e + "I", 8)
                    + ifd + dt
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode_tiff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "byte_order", "n_entries", "width", "height",
                "orientation", "dt_day",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                bom = buf[0:2]
                assert bom in (b"II", b"MM"), "not a TIFF"
                e = "<" if bom == b"II" else ">"
                (magic,) = struct.unpack(e + "H", buf[2:4])
                assert magic == 42, "bad TIFF magic"
                (ifd_off,) = struct.unpack(e + "I", buf[4:8])
                (n,) = struct.unpack(e + "H", buf[ifd_off: ifd_off + 2])
                tags = {}
                for k in range(n):
                    o = ifd_off + 2 + 12 * k
                    tag, typ, cnt = struct.unpack(e + "HHI", buf[o: o + 8])
                    if typ == 3:  # SHORT, left-justified in the value field
                        (v,) = struct.unpack(e + "H", buf[o + 8: o + 10])
                        tags[tag] = v
                    elif typ == 2:  # ASCII via offset
                        (off,) = struct.unpack(e + "I", buf[o + 8: o + 12])
                        tags[tag] = buf[off: off + cnt].rstrip(b"\x00").decode()
                day = int(tags[306].split(" ")[0].split(":")[2])
                out["doc_id"].append(doc_id)
                out["byte_order"].append(bom.decode())
                out["n_entries"].append(n)
                out["width"].append(tags[256])
                out["height"].append(tags[257])
                out["orientation"].append(tags[274])
                out["dt_day"].append(day)
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    tiffs = docs.mapInPandas(synth_tiff, schema="doc_id long, payload binary")
    return tiffs.mapInPandas(decode_tiff, schema=_TIFF_SCHEMA).orderBy("doc_id")


@register(
    "m_zip_archive_extract",
    """
    WITH members AS (
        SELECT d.doc_id, gk.k,
               (d.doc_id % 50) + 10 + 7 * gk.k AS len
        FROM documents d, generate_series(0, 2) AS gk(k)
    ),
    by_byte AS (
        SELECT m.doc_id,
               (3 * m.doc_id + 5 * m.k + 11 * gi.i) % 256 AS v
        FROM members m, generate_series(0, 72) AS gi(i)
        WHERE gi.i < m.len
    ),
    sizes AS (
        SELECT doc_id, CAST(sum(len) AS BIGINT) AS total_bytes
        FROM members GROUP BY doc_id
    ),
    sums AS (
        SELECT doc_id, CAST(sum(v) AS BIGINT) AS byte_sum
        FROM by_byte GROUP BY doc_id
    )
    SELECT s.doc_id,
           CAST(3 AS BIGINT) AS n_members,
           CAST(1 AS BIGINT) AS n_stored,
           CAST(2 AS BIGINT) AS n_deflated,
           s.total_bytes,
           m.byte_sum,
           CAST(3 AS BIGINT) AS crc_ok_members
    FROM sizes s JOIN sums m ON m.doc_id = s.doc_id
    ORDER BY s.doc_id
    """,
)
def m_zip_archive_extract(spark, sf_dir):
    """REAL archive-container walk — the 'zip of scraped site' ingest
    shape: each doc becomes a genuine 3-member ZIP (local file headers,
    raw-DEFLATE and STORED members, central directory, end-of-central-
    directory record, true CRC-32s), and a second Arrow stage extracts
    it back with a spec-faithful reader: EOCD located by signature scan
    from the tail, central-directory entries parsed field by field,
    each member's local header re-parsed and its payload extracted
    (zlib raw inflate for method 8, identity for method 0), then
    size + CRC-32 verified against the directory — a flipped byte in
    headers, stream, or checksum raises or changes the sums.  Member
    CONTENT is deterministic in (doc_id, member, offset), which is what
    lets the oracle recompute the extracted statistics from the
    generator formula without seeing the bytes (the m_png_decode
    license).  zlib is stdlib; no codec stub needed.

    100 TB shape, same as the other decoders: archives live and die
    inside scan-side Arrow tasks (two mapInPandas over the same
    partitioning, payloads never shuffle); only per-archive metadata
    (counts, sizes, checksums) flows on.
    """
    import struct
    import zlib

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth_zip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Write a REAL ZIP per doc: stored member 0, deflated 1-2."""
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                blob = bytearray()
                central = []
                for k in range(3):
                    ln = (d % 50) + 10 + 7 * k
                    content = bytes(
                        (3 * d + 5 * k + 11 * i) % 256 for i in range(ln)
                    )
                    crc = zlib.crc32(content) & 0xFFFFFFFF
                    if k == 0:
                        method, comp = 0, content
                    else:
                        co = zlib.compressobj(6, zlib.DEFLATED, -15)
                        method, comp = 8, co.compress(content) + co.flush()
                    name = f"member_{k}.bin".encode()
                    central.append(
                        (name, method, crc, len(comp), ln, len(blob))
                    )
                    blob += (
                        struct.pack(
                            "<IHHHHHIIIHH",
                            0x04034B50, 20, 0, method, 0, 0,
                            crc, len(comp), ln, len(name), 0,
                        )
                        + name
                        + comp
                    )
                cd_start = len(blob)
                for name, method, crc, csize, usize, off in central:
                    blob += (
                        struct.pack(
                            "<IHHHHHHIIIHHHHHII",
                            0x02014B50, 20, 20, 0, method, 0, 0,
                            crc, csize, usize, len(name),
                            0, 0, 0, 0, 0, off,
                        )
                        + name
                    )
                blob += struct.pack(
                    "<IHHHHIIH",
                    0x06054B50, 0, 0, 3, 3,
                    len(blob) - cd_start, cd_start, 0,
                )
                payloads.append(bytes(blob))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def extract_zip(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        """Spec-faithful ZIP reader: EOCD scan, central dir, verify."""
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                pos = b.rfind(b"PK\x05\x06")
                if pos < 0:
                    raise ValueError("no end-of-central-directory")
                (_sig, _dk, _cdk, _nd, n_total, _cds, cd_off, _cl) = (
                    struct.unpack("<IHHHHIIH", b[pos : pos + 22])
                )
                p = cd_off
                n_stored = n_defl = total = bsum = ok = 0
                for _ in range(n_total):
                    (
                        csig, _vm, _vn, _fl, method, _mt, _md,
                        crc, csize, usize, nlen, elen, cmlen,
                        _disk, _ia, _ea, off,
                    ) = struct.unpack("<IHHHHHHIIIHHHHHII", b[p : p + 46])
                    if csig != 0x02014B50:
                        raise ValueError("bad central-directory entry")
                    p += 46 + nlen + elen + cmlen
                    (lsig, _lv, _lf, _lm, _lmt, _lmd, _lcrc, _lcs,
                     _lus, lnlen, lelen) = struct.unpack(
                        "<IHHHHHIIIHH", b[off : off + 30]
                    )
                    if lsig != 0x04034B50:
                        raise ValueError("bad local header")
                    data_at = off + 30 + lnlen + lelen
                    data = b[data_at : data_at + csize]
                    content = (
                        data
                        if method == 0
                        else zlib.decompress(data, -15)
                    )
                    if len(content) != usize:
                        raise ValueError("size mismatch")
                    if (zlib.crc32(content) & 0xFFFFFFFF) != crc:
                        raise ValueError("crc mismatch")
                    ok += 1
                    total += usize
                    bsum += sum(content)
                    if method == 0:
                        n_stored += 1
                    else:
                        n_defl += 1
                rows.append(
                    (int(doc_id), n_stored + n_defl, n_stored,
                     n_defl, total, bsum, ok)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_members", "n_stored", "n_deflated",
                    "total_bytes", "byte_sum", "crc_ok_members",
                ],
            )

    archives = docs.mapInPandas(
        synth_zip, "doc_id long, payload binary"
    )
    return archives.mapInPandas(
        extract_zip,
        "doc_id long, n_members long, n_stored long, n_deflated long,"
        " total_bytes long, byte_sum long, crc_ok_members long",
    ).orderBy("doc_id")


@register(
    "m_gif_decode",
    """
    WITH spec AS (
        SELECT doc_id,
               (doc_id % 10) + 4 AS w,
               (doc_id % 7) + 3 AS h
        FROM documents
    ),
    px AS (
        SELECT s.doc_id, s.w, s.h,
               (3 * s.doc_id + gx.x + 2 * gy.y) % 256 AS idx
        FROM spec s,
             generate_series(0, 13) AS gx(x),
             generate_series(0, 9) AS gy(y)
        WHERE gx.x < s.w AND gy.y < s.h
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(count(*) AS BIGINT) AS n_pixels,
           CAST(sum(idx) AS BIGINT) AS sum_r,
           CAST(sum((idx * 3) % 256) AS BIGINT) AS sum_g,
           CAST(sum((idx * 7) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, w, h
    ORDER BY doc_id
    """,
)
def m_gif_decode(spark, sf_dir):
    """REAL LZW image codec, end to end — the second genuinely
    compressed format beside m_png_decode's DEFLATE, and a different
    algorithm family entirely: each doc becomes a true GIF87a (logical
    screen descriptor, 256-entry global color table, image descriptor,
    variable-width LSB-first LZW code stream with clear/EOI codes and
    dictionary growth to 12 bits, 255-byte sub-block framing,
    trailer), and a second Arrow stage decodes it with a spec-faithful
    reader: header/palette parse, sub-block reassembly, full LZW
    dictionary reconstruction (including the K-omega 'code not yet in
    table' case), palette mapping.  A flipped byte anywhere corrupts
    the code stream — changed sums or a raise.  Pixel CONTENT is
    deterministic in (doc_id, x, y), so the oracle recomputes the
    channel statistics from the generator formula without seeing any
    bytes (the m_png_decode license).

    Same 100 TB shape: blobs live and die inside scan-side Arrow
    tasks (two mapInPandas, same partitioning, no payload shuffle);
    only decoded metadata flows on.
    """
    import struct

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def _lzw_encode(indices: list, min_code: int = 8) -> bytes:
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        out_bits: list = []
        code_size = min_code + 1

        def emit(code: int, size: int) -> None:
            for b in range(size):
                out_bits.append((code >> b) & 1)

        table = {(i,): i for i in range(1 << min_code)}
        next_code = eoi + 1
        emit(clear, code_size)
        omega: tuple = ()
        for k in indices:
            cand = omega + (k,)
            if cand in table:
                omega = cand
                continue
            emit(table[omega], code_size)
            table[cand] = next_code
            next_code += 1
            if next_code > (1 << code_size) and code_size < 12:
                code_size += 1
            elif next_code >= 4096:
                emit(clear, code_size)
                table = {(i,): i for i in range(1 << min_code)}
                next_code = eoi + 1
                code_size = min_code + 1
            omega = (k,)
        if omega:
            emit(table[omega], code_size)
        emit(eoi, code_size)
        by = bytearray()
        for i in range(0, len(out_bits), 8):
            v = 0
            for j, bit in enumerate(out_bits[i : i + 8]):
                v |= bit << j
            by.append(v)
        return bytes(by)

    def _lzw_decode(data: bytes, min_code: int = 8) -> list:
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        bits = []
        for byte in data:
            for b in range(8):
                bits.append((byte >> b) & 1)
        pos = 0
        code_size = min_code + 1
        table: list = [(i,) for i in range(1 << min_code)] + [None, None]
        out: list = []
        prev: tuple | None = None

        def read() -> int:
            nonlocal pos
            v = 0
            for b in range(code_size):
                if pos >= len(bits):
                    raise ValueError("truncated LZW stream")
                v |= bits[pos] << b
                pos += 1
            return v

        while True:
            code = read()
            if code == clear:
                table = [(i,) for i in range(1 << min_code)] + [
                    None,
                    None,
                ]
                code_size = min_code + 1
                prev = None
                continue
            if code == eoi:
                break
            if code < len(table) and table[code] is not None:
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + (prev[0],)  # the K-omega special case
            else:
                raise ValueError("bad LZW code")
            out.extend(entry)
            if prev is not None:
                table.append(prev + (entry[0],))
                if (
                    len(table) == (1 << code_size)
                    and code_size < 12
                ):
                    code_size += 1
            prev = entry
        return out

    def synth_gif(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = (d % 10) + 4, (d % 7) + 3
                idx = [
                    (3 * d + x + 2 * y) % 256
                    for y in range(h)
                    for x in range(w)
                ]
                pal = bytearray()
                for i in range(256):
                    pal += bytes((i, (i * 3) % 256, (i * 7) % 256))
                blob = bytearray(b"GIF87a")
                blob += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
                blob += pal
                blob += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
                blob += bytes([8])  # LZW min code size
                comp = _lzw_encode(idx)
                for i in range(0, len(comp), 255):
                    chunk = comp[i : i + 255]
                    blob += bytes([len(chunk)]) + chunk
                blob += b"\x00\x3b"
                payloads.append(bytes(blob))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode_gif(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:6] != b"GIF87a":
                    raise ValueError("bad GIF signature")
                w, h, flags, _bg, _ar = struct.unpack("<HHBBB", b[6:13])
                if not flags & 0x80:
                    raise ValueError("expected global color table")
                gct_n = 2 << (flags & 0x07)
                pal = b[13 : 13 + 3 * gct_n]
                p = 13 + 3 * gct_n
                if b[p] != 0x2C:
                    raise ValueError("expected image descriptor")
                _ix, _iy, iw, ih, iflags = struct.unpack(
                    "<HHHHB", b[p + 1 : p + 10]
                )
                p += 10
                min_code = b[p]
                p += 1
                comp = bytearray()
                while True:
                    ln = b[p]
                    p += 1
                    if ln == 0:
                        break
                    comp += b[p : p + ln]
                    p += ln
                if b[p] != 0x3B:
                    raise ValueError("missing trailer")
                idx = _lzw_decode(bytes(comp), min_code)
                if len(idx) != iw * ih:
                    raise ValueError("pixel count mismatch")
                sr = sum(pal[3 * i] for i in idx)
                sg = sum(pal[3 * i + 1] for i in idx)
                sb = sum(pal[3 * i + 2] for i in idx)
                rows.append(
                    (int(doc_id), int(iw), int(ih), len(idx), sr, sg, sb)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_pixels",
                    "sum_r", "sum_g", "sum_b",
                ],
            )

    gifs = docs.mapInPandas(synth_gif, "doc_id long, payload binary")
    return gifs.mapInPandas(
        decode_gif,
        "doc_id long, width long, height long, n_pixels long,"
        " sum_r long, sum_g long, sum_b long",
    ).orderBy("doc_id")


@register(
    "m_base64_data_url",
    """
    WITH members AS (
        SELECT d.doc_id,
               (d.doc_id % 40) + 5 AS len
        FROM documents d
    ),
    by_byte AS (
        SELECT m.doc_id, m.len,
               (7 * m.doc_id + 13 * gi.i) % 256 AS v
        FROM members m, generate_series(0, 44) AS gi(i)
        WHERE gi.i < m.len
    )
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 'image/gif'
                     WHEN doc_id % 3 = 1 THEN 'audio/wav'
                     ELSE 'application/octet-stream' END AS VARCHAR)
               AS mime,
           CAST(max(len) AS BIGINT) AS n_bytes,
           CAST(4 * ((max(len) + 2) // 3) AS BIGINT) AS b64_len,
           CAST(sum(v) AS BIGINT) AS byte_sum
    FROM by_byte GROUP BY doc_id ORDER BY doc_id
    """,
)
def m_base64_data_url(spark, sf_dir):
    """data: URL ingestion — the scraped-HTML embedded-asset shape
    (inline images/audio arrive as `data:<mime>;base64,<payload>`
    strings inside crawled pages): each doc synthesizes a REAL RFC
    2397 data URL (deterministic bytes, stdlib base64), and the
    decode stage parses scheme/mime/encoding, base64-decodes, and
    reports byte-exact statistics — a corrupted character raises in
    strict validation.  The oracle recomputes everything from the
    content formula INCLUDING the base64 length identity
    4·⌈n/3⌉ — so the padding arithmetic is itself verified.

    Unlike the m_*_decode keys this one is STRING-side: the payload
    rides a text column (exactly how it appears in a crawl), decodes
    JVM-free in Arrow batches, and never shuffles — the downstream
    binary then feeds the same codec keys (m_gif_decode et al).
    """
    import base64

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    mimes = ["image/gif", "audio/wav", "application/octet-stream"]

    def synth_url(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                ln = (d % 40) + 5
                content = bytes((7 * d + 13 * i) % 256 for i in range(ln))
                b64 = base64.b64encode(content).decode("ascii")
                urls.append(f"data:{mimes[d % 3]};base64,{b64}")
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "url": urls})

    def parse_url(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, url in zip(pdf["doc_id"], pdf["url"]):
                if not url.startswith("data:"):
                    raise ValueError("not a data URL")
                head, payload = url[5:].split(",", 1)
                if not head.endswith(";base64"):
                    raise ValueError("expected base64 encoding")
                mime = head[: -len(";base64")]
                content = base64.b64decode(payload, validate=True)
                rows.append(
                    (
                        int(doc_id),
                        mime,
                        len(content),
                        len(payload),
                        sum(content),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mime", "n_bytes", "b64_len", "byte_sum"
                ],
            )

    urls = docs.mapInPandas(synth_url, "doc_id long, url string")
    return urls.mapInPandas(
        parse_url,
        "doc_id long, mime string, n_bytes long, b64_len long,"
        " byte_sum long",
    ).orderBy("doc_id")


@register(
    "m_varint_decode",
    """
    WITH vals AS (
        SELECT d.doc_id, gk.k,
               (d.doc_id * 2654435761 + gk.k * 40503) % 3000000 AS v
        FROM documents d, generate_series(0, 19) AS gk(k)
    )
    SELECT doc_id,
           CAST(20 AS BIGINT) AS n_values,
           CAST(sum(v) AS BIGINT) AS value_sum,
           CAST(max(v) AS BIGINT) AS value_max,
           CAST(sum(CASE WHEN v < 128 THEN 1
                         WHEN v < 16384 THEN 2
                         WHEN v < 2097152 THEN 3
                         ELSE 4 END) AS BIGINT) AS encoded_bytes
    FROM vals GROUP BY doc_id ORDER BY doc_id
    """,
)
def m_varint_decode(spark, sf_dir):
    """Varint wire-format codec — the variable-length integer encoding
    at the bottom of protobuf, SQLite, Parquet's RLE hybrids, and
    LevelDB (7 bits per byte, MSB = continuation): each doc becomes a
    REAL varint stream of 20 values, and a second Arrow stage decodes
    it byte by byte (accumulating 7-bit groups until a clear MSB, a
    malformed overlong sequence raises).  The oracle recomputes the
    value statistics from the generator formula AND the exact encoded
    length from the value magnitudes (1 byte < 2⁷, 2 < 2¹⁴, 3 < 2²¹,
    else 4) — so the decoder is verified on both CONTENT and
    FRAMING.

    Same shape as every decoder key: streams live and die in
    scan-side Arrow tasks, two mapInPandas on one partitioning, only
    per-stream metadata flows on.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def synth_varint(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                out = bytearray()
                for k in range(20):
                    v = (d * 2654435761 + k * 40503) % 3000000
                    while True:
                        byte = v & 0x7F
                        v >>= 7
                        if v:
                            out.append(byte | 0x80)
                        else:
                            out.append(byte)
                            break
                payloads.append(bytes(out))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    def decode_varint(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                vals = []
                v = shift = 0
                for byte in b:
                    if shift > 28:
                        raise ValueError("overlong varint")
                    v |= (byte & 0x7F) << shift
                    if byte & 0x80:
                        shift += 7
                    else:
                        vals.append(v)
                        v = shift = 0
                if shift:
                    raise ValueError("truncated varint stream")
                rows.append(
                    (int(doc_id), len(vals), sum(vals), max(vals), len(b))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_values", "value_sum", "value_max",
                    "encoded_bytes",
                ],
            )

    streams = docs.mapInPandas(
        synth_varint, "doc_id long, payload binary"
    )
    return streams.mapInPandas(
        decode_varint,
        "doc_id long, n_values long, value_sum long, value_max long,"
        " encoded_bytes long",
    ).orderBy("doc_id")


@register(
    "m_image_dhash",
    """
    WITH spec AS (
        SELECT doc_id,
               (doc_id % 16) + 8 AS w,
               (doc_id % 10) + 5 AS h
        FROM documents WHERE doc_id < 200
    ),
    bits AS (
        SELECT s.doc_id,
               gx.x AS bx, gy.y AS by,
               CASE WHEN
                   (5 * s.doc_id
                    + 2 * (((gx.x + 1) * (s.w - 1)) // 8)
                    + 3 * ((gy.y * (s.h - 1)) // 7))
                   % 256
                   + 2 * ((s.doc_id
                           + 4 * (((gx.x + 1) * (s.w - 1)) // 8)
                           + 9 * ((gy.y * (s.h - 1)) // 7)) % 256)
                   + (7 * s.doc_id
                      + (((gx.x + 1) * (s.w - 1)) // 8)
                      + 6 * ((gy.y * (s.h - 1)) // 7)) % 256
                   >
                   (5 * s.doc_id + 2 * ((gx.x * (s.w - 1)) // 8)
                    + 3 * ((gy.y * (s.h - 1)) // 7)) % 256
                   + 2 * ((s.doc_id + 4 * ((gx.x * (s.w - 1)) // 8)
                           + 9 * ((gy.y * (s.h - 1)) // 7)) % 256)
                   + (7 * s.doc_id + ((gx.x * (s.w - 1)) // 8)
                      + 6 * ((gy.y * (s.h - 1)) // 7)) % 256
               THEN 1 ELSE 0 END AS bit
        FROM spec s,
             generate_series(0, 7) AS gx(x),
             generate_series(0, 7) AS gy(y)
    ),
    sig AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN by * 8 + bx < 32
                             THEN bit * (CAST(2 AS BIGINT)
                                         ** (by * 8 + bx))
                             ELSE 0 END) AS BIGINT) AS lo,
               CAST(sum(CASE WHEN by * 8 + bx >= 32
                             THEN bit * (CAST(2 AS BIGINT)
                                         ** (by * 8 + bx - 32))
                             ELSE 0 END) AS BIGINT) AS hi
        FROM bits GROUP BY doc_id
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
                   AS ham
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(ham AS BIGINT) AS hamming
    FROM pairs WHERE ham = 0
    ORDER BY doc_a, doc_b
    """,
)
def m_image_dhash(spark, sf_dir):
    """Perceptual image dedup by difference hash — VISUAL near-dup,
    the tier the byte-level keys can't reach (m_checksum_audit
    catches identical FILES; re-encoded or resized images hash
    differently byte-wise but look the same): each image resamples to
    a 9×8 grid by nearest-neighbor (index arithmetic on the SAME
    pixel formula m_png_decode's rasters use — the dHash is computed
    from decoded-pixel VALUES, so the oracle can mirror it), each of
    the 64 bits records 'is the right neighbor brighter' (luma =
    r+2g+b), and near-duplicates here are EXACT signature matches (Hamming 0 —
    the synthetic gradient rasters are so self-similar that 60% of all
    pairs sit within 6 bits, so the exact tier is the honest census;
    real photos spread the distances and a ≤6 band is the usual knob)
    — the
    classic 64-bit dHash of every image-dedup pipeline, robust to
    scale/brightness shifts by construction.

    The pair join is the v_hamming_topk integer tier: 8-byte
    signatures, bit_count(XOR) in codegen, doc_id < doc_id — at
    corpus scale the signatures feed the banded-LSH prefilter exactly
    like simhash does (t_simhash_pairs' plan); the bounded doc_id <
    200 census keeps the exact audit cheap.
    """
    import numpy as np

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 200
    ).select("doc_id")

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = (d % 16) + 8, (d % 10) + 5
                lo = hi = 0
                for by in range(8):
                    y = (by * (h - 1)) // 7
                    for bx in range(8):
                        x0 = (bx * (w - 1)) // 8
                        x1 = ((bx + 1) * (w - 1)) // 8

                        def luma(x, y):
                            r = (5 * d + 2 * x + 3 * y) % 256
                            g = (d + 4 * x + 9 * y) % 256
                            b = (7 * d + x + 6 * y) % 256
                            return r + 2 * g + b

                        if luma(x1, y) > luma(x0, y):
                            pos = by * 8 + bx
                            if pos < 32:
                                lo |= 1 << pos
                            else:
                                hi |= 1 << (pos - 32)
                rows.append((d, lo, hi))
            yield pd.DataFrame(rows, columns=["doc_id", "lo", "hi"])

    sig = docs.mapInPandas(dhash, "doc_id long, lo long, hi long")
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lo").alias("la"),
        F.col("hi").alias("ua"),
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lo").alias("lb"),
        F.col("hi").alias("ub"),
    )
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.bit_count(F.expr("la ^ lb"))
                + F.bit_count(F.expr("ua ^ ub"))
            )
            .cast("long")
            .alias("hamming"),
        )
        .where(F.col("hamming") == 0)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "m_webdataset_shards",
    """
    WITH sized AS (
        SELECT source, doc_id,
               octet_length(encode(text)) AS blob_bytes,
               sum(octet_length(encode(text))) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_bytes
        FROM documents
    )
    SELECT source,
           CAST((cum_bytes - blob_bytes) // 4096 AS BIGINT) AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(blob_bytes) AS BIGINT) AS n_bytes,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM sized
    GROUP BY source, (cum_bytes - blob_bytes) // 4096
    """,
)
def m_webdataset_shards(spark, sf_dir):
    """WebDataset-style shard packing: size-capped sequential shards with
    an index manifest — the layout multimodal training corpora actually
    ship in (tar shards of ~equal byte size, read sequentially by data
    loaders; WebDataset / tfrecord conventions, public).

    Samples pack into a shard until the byte budget (4 KiB here; ~1 GiB
    in production) is crossed, then a new shard opens. A literal
    greedy writer is a sequential recurrence; the distributed form is the
    standard prefix-sum assignment: shard_id = bytes-before-me DIV cap,
    which bounds every shard to cap + one sample — the same guarantee a
    greedy close gives, computable in one partitioned window. The output
    is the shard MANIFEST (per shard: sample count, byte size, first/last
    id) — what a loader needs to seek without reading tars.

    Scale design: the window partitions by source (in production,
    source × date) and orders by sample id WITHIN each partition — never
    a global total order, so the plan holds when one corpus has millions
    of shards. Blob bytes never shuffle: the only exchange carries
    (source, doc_id, blob_bytes) triples; actual tar writing would be a
    downstream partitionBy(source, shard_id) write where each task
    streams its own samples.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blob = F.octet_length(F.col("text").cast("binary"))
    sized = docs.select(
        "source",
        "doc_id",
        blob.alias("blob_bytes"),
        F.sum(blob).over(w).alias("cum_bytes"),
    )
    return (
        sized.withColumn(
            "shard_id",
            ((F.col("cum_bytes") - F.col("blob_bytes")) / F.lit(4096))
            .cast("long"),
        )
        .groupBy("source", "shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("blob_bytes").cast("long").alias("n_bytes"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
        )
    )


@register(
    "m_audio_vad",
    """
    WITH spec AS (
        SELECT doc_id, (doc_id % 50) + 20 AS n FROM documents
    ),
    fr AS (
        SELECT s.doc_id, g.f,
               CAST(list_sum(list_transform(range(0, 10),
                   k -> abs(((s.doc_id * 31 + (10 * g.f + k) * 17) % 65536)
                            - 32768))) AS BIGINT) AS fsum
        FROM spec s, generate_series(0, 6) AS g(f)
        WHERE g.f < s.n // 10
    ),
    tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
               CAST(sum(fsum) AS BIGINT) AS total
        FROM fr GROUP BY 1
    ),
    v AS (
        SELECT fr.doc_id, fr.f
        FROM fr JOIN tot ON tot.doc_id = fr.doc_id
        WHERE fr.fsum * tot.n_frames > tot.total
    ),
    isl AS (
        SELECT doc_id,
               f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS g
        FROM v
    ),
    seg AS (
        SELECT doc_id, g, CAST(count(*) AS BIGINT) AS len
        FROM isl GROUP BY 1, 2
    ),
    segagg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
               CAST(max(len) AS BIGINT) AS max_segment_frames,
               CAST(sum(len) AS BIGINT) AS n_voiced
        FROM seg GROUP BY 1
    )
    SELECT t.doc_id, t.n_frames,
           coalesce(sa.n_voiced, 0) AS n_voiced,
           coalesce(sa.n_segments, 0) AS n_segments,
           coalesce(sa.max_segment_frames, 0) AS max_segment_frames
    FROM tot t LEFT JOIN segagg sa ON sa.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
)
def m_audio_vad(spark, sf_dir):
    """Energy-based voice-activity detection over REAL decoded audio:
    the m_wav_decode RIFF round-trip (genuine header + PCM16 frames)
    feeds a frame-energy stage — 10-sample frames, energy = sum |pcm|
    as an exact BIGINT — and a frame is 'voiced' when its energy
    strictly exceeds the document's mean frame energy (the integer
    cross-multiply fsum * n_frames > total keeps the threshold
    float-free).  Voiced runs become segments via the sessionize
    island trick (frame_idx - row_number), yielding the per-document
    census every speech pipeline starts with: voiced frames, segment
    count, longest segment.

    The Spark side decodes REAL bytes (chunk-walking RIFF parser, the
    m_wav_decode stage, emitting per-frame rows from numpy-reshaped
    PCM); the oracle recomputes the same census from the generator
    formula — a flipped payload byte changes frame sums and fails the
    hash.  Trailing sub-10-sample partials are dropped on both sides
    (decoders frame on fixed hops; the remainder never fills a hop).

    Scale: payload bytes never shuffle — synth, parse, and framing are
    one mapInPandas chain partitioned by doc; only the (doc, frame,
    energy) rows (a ~10x reduction of the PCM) enter the exchange for
    the island windows.  With real ingested audio the synth stage is
    the blob-store scan and everything downstream is unchanged.
    """
    import struct

    import numpy as np

    def synth_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # identical RIFF writer to m_wav_decode (real container bytes)
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = (d % 50) + 20
                rate = 8000 + (d % 3) * 4000
                samples = (
                    (d * 31 + np.arange(n) * 17) % 65536 - 32768
                ).astype("<i2")
                data = samples.tobytes()
                hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                fmt = b"fmt " + struct.pack(
                    "<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16
                )
                payloads.append(
                    hdr + fmt + b"data" + struct.pack("<I", len(data)) + data
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def frame_energies(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # real RIFF chunk walk -> PCM16 -> 10-sample frame |sum| census
        for pdf in batches:
            doc_ids, fidx, fsums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                assert buf[0:4] == b"RIFF" and buf[8:12] == b"WAVE"
                pos, data = 12, None
                while pos + 8 <= len(buf):
                    cid = buf[pos: pos + 4]
                    (clen,) = struct.unpack("<I", buf[pos + 4: pos + 8])
                    if cid == b"data":
                        data = buf[pos + 8: pos + 8 + clen]
                    pos += 8 + clen + (clen & 1)
                samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
                nf = len(samples) // 10
                if nf == 0:
                    continue
                sums = (
                    np.abs(samples[: nf * 10]).reshape(nf, 10).sum(axis=1)
                )
                doc_ids.extend([int(doc_id)] * nf)
                fidx.extend(range(nf))
                fsums.extend(int(x) for x in sums)
            yield pd.DataFrame(
                {"doc_id": doc_ids, "f": fidx, "fsum": fsums}
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    wav = docs.mapInPandas(synth_wav, schema="doc_id long, payload binary")
    fr = wav.mapInPandas(
        frame_energies, schema="doc_id long, f long, fsum long"
    ).cache()  # two consumers (tot, v) must not re-run the Arrow decode
    tot = fr.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.sum("fsum").cast("long").alias("total"),
    )
    v = fr.join(tot, "doc_id").where(
        F.col("fsum") * F.col("n_frames") > F.col("total")
    )
    isl = v.select(
        "doc_id",
        (
            F.col("f")
            - F.row_number().over(
                Window.partitionBy("doc_id").orderBy("f")
            )
        ).alias("g"),
    )
    seg = isl.groupBy("doc_id", "g").agg(
        F.count("*").cast("long").alias("len")
    )
    segagg = seg.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_segments"),
        F.max("len").cast("long").alias("max_segment_frames"),
        F.sum("len").cast("long").alias("n_voiced"),
    )
    z = F.lit(0).cast("long")
    return (
        tot.join(segagg, "doc_id", "left")
        .select(
            "doc_id",
            "n_frames",
            F.coalesce(F.col("n_voiced"), z).alias("n_voiced"),
            F.coalesce(F.col("n_segments"), z).alias("n_segments"),
            F.coalesce(F.col("max_segment_frames"), z).alias(
                "max_segment_frames"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "m_image_tiling",
    """
    WITH spec AS (
        SELECT doc_id, (doc_id % 20) + 8 AS w, (doc_id % 12) + 6 AS h
        FROM documents
    ),
    grid AS (
        SELECT s.doc_id, s.w, s.h, gx.px, gy.py
        FROM spec s, generate_series(0, 6) AS gx(px),
             generate_series(0, 4) AS gy(py)
        WHERE gx.px < s.w // 4 AND gy.py < s.h // 4
    ),
    psum AS (
        SELECT doc_id, w, h, px, py,
               CAST(list_sum(list_transform(range(0, 4), dy ->
                   list_sum(list_transform(range(0, 4), dx ->
                       (doc_id + 3 * (px * 4 + dx) + 7 * (py * 4 + dy))
                       % 256)))) AS BIGINT) AS s
        FROM grid
    ),
    mx AS (SELECT doc_id, max(s) AS ms,
                  CAST(count(*) AS BIGINT) AS n_patches
           FROM psum GROUP BY doc_id)
    SELECT p.doc_id,
           CAST(p.w // 4 AS BIGINT) AS grid_w,
           CAST(p.h // 4 AS BIGINT) AS grid_h,
           mx.n_patches,
           p.s AS max_patch_sum,
           CAST(p.px AS BIGINT) AS argmax_px,
           CAST(p.py AS BIGINT) AS argmax_py
    FROM psum p JOIN mx ON mx.doc_id = p.doc_id AND p.s = mx.ms
    QUALIFY row_number() OVER (PARTITION BY p.doc_id
                               ORDER BY p.py, p.px) = 1
    ORDER BY p.doc_id
    """,
)
def m_image_tiling(spark, sf_dir):
    """ViT-style image patchification over REAL decoded pixels — the
    patch-embedding prep every vision-language pipeline runs: each doc
    becomes a genuine P6 PPM (the m_ppm_decode writer), a second Arrow
    stage parses the raster back and tiles it into 4x4 pixel patches
    (numpy reshape-sum, remainder rows/cols dropped exactly as patch
    embedders do), and the per-patch red-channel sums flow out as
    rows.  The relational tail finds each image's brightest patch
    (deterministic (py, px) tiebreak) — the saliency-argmax primitive
    behind smart cropping and patch dropout.  The oracle recomputes
    every patch sum from the pixel generator formula, so one flipped
    payload byte fails the hash.

    Scale: blob bytes never leave the scan-side Arrow chain; only
    (doc, patch, sum) rows — a 16x reduction of the raster — reach the
    exchange, and the argmax is a per-doc window over a bounded patch
    grid.  With real images the synth stage is the blob-store scan
    and the tiling math is unchanged (dinov2-style 14x14 patches just
    change the constant).
    """
    import struct  # noqa: F401  (parity with the sibling decoders)

    import numpy as np

    def synth_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = (d % 20) + 8, (d % 12) + 6
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                r = (d + 3 * x + 7 * y) % 256
                g = (2 * d + 5 * x + y) % 256
                b = (3 * d + x + 11 * y) % 256
                raster = np.stack(
                    np.broadcast_arrays(r, g, b), axis=-1
                ).astype(np.uint8)
                payloads.append(
                    f"P6\n{w} {h}\n255\n".encode() + raster.tobytes()
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def tile(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, pxs, pys, sums = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                assert buf[:2] == b"P6", "not a P6 PPM"
                parts = buf.split(b"\n", 3)
                w, h = (int(v) for v in parts[1].split())
                assert parts[2] == b"255"
                raster = np.frombuffer(
                    parts[3], dtype=np.uint8, count=w * h * 3
                ).reshape(h, w, 3)
                gw, gh = w // 4, h // 4
                red = raster[: gh * 4, : gw * 4, 0].astype(np.int64)
                patch = red.reshape(gh, 4, gw, 4).sum(axis=(1, 3))
                for py in range(gh):
                    for px in range(gw):
                        ids.append(int(doc_id))
                        ws.append(gw)
                        hs.append(gh)
                        pxs.append(px)
                        pys.append(py)
                        sums.append(int(patch[py, px]))
            yield pd.DataFrame(
                {
                    "doc_id": ids, "grid_w": ws, "grid_h": hs,
                    "px": pxs, "py": pys, "s": sums,
                }
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ppm = docs.mapInPandas(synth_ppm, schema="doc_id long, payload binary")
    psum = ppm.mapInPandas(
        tile,
        schema="doc_id long, grid_w long, grid_h long, px long, py long,"
        " s long",
    ).cache()  # two consumers (mx, argmax join) must not re-decode
    mx = psum.groupBy("doc_id").agg(
        F.max("s").alias("ms"), F.count("*").cast("long").alias("n_patches")
    )
    wpick = Window.partitionBy("doc_id").orderBy("py", "px")
    return (
        psum.join(mx, "doc_id")
        .where(F.col("s") == F.col("ms"))
        .withColumn("rn", F.row_number().over(wpick))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "grid_w",
            "grid_h",
            "n_patches",
            F.col("s").alias("max_patch_sum"),
            F.col("px").alias("argmax_px"),
            F.col("py").alias("argmax_py"),
        )
        .orderBy("doc_id")
    )


@register(
    "m_shot_detection",
    """
    WITH spec AS (
        SELECT doc_id, (doc_id % 30) + 12 AS nf, (doc_id % 5) + 4 AS p
        FROM documents
    ),
    fr AS (
        SELECT s.doc_id, s.nf, s.p, g.t
        FROM spec s, generate_series(1, 41) AS g(t)
        WHERE g.t < s.nf
    ),
    diffs AS (
        SELECT doc_id, nf, p, t,
               CAST(list_sum(flatten(list_transform(range(0, 6), y ->
                   list_transform(range(0, 8), x ->
                       abs((((doc_id + 3 * x + 7 * y) % 128)
                             + (t % p) + 50 * ((t // p) % 2))
                           - (((doc_id + 3 * x + 7 * y) % 128)
                              + ((t - 1) % p)
                              + 50 * (((t - 1) // p) % 2)))))))
                   AS BIGINT) AS sum_abs
        FROM fr
    ),
    census AS (
        SELECT doc_id, max(nf) AS nf, max(p) AS p,
               CAST(sum(CASE WHEN sum_abs > 8 * 48 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_cuts
        FROM diffs GROUP BY doc_id
    )
    SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
           CAST(p AS BIGINT) AS scene_period, n_cuts,
           n_cuts + 1 AS n_shots,
           CAST(CASE WHEN n_cuts = (nf - 1) // p THEN 1 ELSE 0 END
                AS BIGINT) AS cuts_match_planted
    FROM census ORDER BY doc_id
    """,
)
def m_shot_detection(spark, sf_dir):
    """Shot-boundary detection over REAL decoded frames — the temporal
    segmentation step of every video-understanding pipeline: each doc
    becomes a sequence of genuine 8x6 grayscale rasters (one blob per
    frame) whose pixel process drifts by +1/frame WITHIN a scene and
    flips a 50-level appearance offset at planted scene boundaries
    (every (doc_id % 5)+4 frames); the pixel formula is built
    NON-WRAPPING (base%128 + phase <= 185 < 256), so within-scene
    diffs are exactly 1/pixel and boundary diffs >= 42/pixel — the
    first design ((base + 37*scene + t) % 256) wrapped at value 255
    and false-triggered 135/500 docs, the exact artifact real
    pixel-domain detectors hit on dirty decodes.  The detector
    declares a cut when mean |pixel delta| > 8 levels (the classic
    rule) and the census compares detected cuts against the planted
    count in-row (cuts_match_planted — pytest pins it to 1 for every
    doc: precision AND recall exactly 1 by construction).

    Scale: synth is mapInPandas (frame blobs never shuffle as video —
    they move once, doc-grouped, into the diff stage); the diff runs
    in applyInPandas per doc (the grouping GUARANTEE matters: frame t
    and t-1 must land in one task, which plain mapInPandas does not
    promise across Arrow batch splits); only (doc, t, sum_abs) rows
    reach the relational census.  With real video the synth is the
    demuxer and the diff stage is unchanged — at 100 TB the per-doc
    group is one clip's frames, bounded by clip length.
    """
    import numpy as np

    def synth_frames(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ts, payloads = [], [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                nf = (d % 30) + 12
                p = (d % 5) + 4
                x = np.arange(8)[None, :]
                y = np.arange(6)[:, None]
                base = (d + 3 * x + 7 * y) % 128
                for t in range(nf):
                    raster = (
                        base + (t % p) + 50 * ((t // p) % 2)
                    ).astype(np.uint8)
                    ids.append(d)
                    ts.append(t)
                    payloads.append(raster.tobytes())
            yield pd.DataFrame(
                {"doc_id": ids, "t": ts, "payload": payloads}
            )

    def frame_diffs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t").reset_index(drop=True)
        rasters = [
            np.frombuffer(b, dtype=np.uint8).astype(np.int64)
            for b in pdf["payload"]
        ]
        ts, sums = [], []
        for i in range(1, len(rasters)):
            ts.append(int(pdf["t"].iloc[i]))
            sums.append(int(np.abs(rasters[i] - rasters[i - 1]).sum()))
        return pd.DataFrame(
            {
                "doc_id": [int(pdf["doc_id"].iloc[0])] * len(ts),
                "t": ts,
                "sum_abs": sums,
            }
        )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    frames = docs.mapInPandas(
        synth_frames, schema="doc_id long, t long, payload binary"
    )
    diffs = frames.groupBy("doc_id").applyInPandas(
        frame_diffs, schema="doc_id long, t long, sum_abs long"
    )
    spec = docs.select(
        "doc_id",
        ((F.col("doc_id") % 30) + 12).alias("nf"),
        ((F.col("doc_id") % 5) + 4).alias("p"),
    )
    census = diffs.groupBy("doc_id").agg(
        F.sum(F.when(F.col("sum_abs") > 8 * 48, 1).otherwise(0))
        .cast("long")
        .alias("n_cuts")
    )
    return (
        spec.join(census, "doc_id")
        .select(
            "doc_id",
            F.col("nf").cast("long").alias("n_frames"),
            F.col("p").cast("long").alias("scene_period"),
            "n_cuts",
            (F.col("n_cuts") + 1).alias("n_shots"),
            F.when(
                F.col("n_cuts") == F.expr("(nf - 1) div p"), 1
            )
            .otherwise(0)
            .cast("long")
            .alias("cuts_match_planted"),
        )
        .orderBy("doc_id")
    )


_SRT_SCHEMA = (
    "doc_id long, n_cues long, total_sub_ms long, span_ms long, "
    "n_chars long, n_overlaps long, chars_per_sec long"
)


@register(
    "m_srt_parse",
    """
    WITH spec AS (
        SELECT doc_id, (doc_id % 8) + 3 AS n FROM documents
    ),
    cues AS (
        SELECT s.doc_id, s.n, g.i,
               g.i * 2000 + (s.doc_id % 997) AS start_ms,
               900 + ((s.doc_id * 7 + g.i * 13) % 1500) AS dur_ms,
               10 + ((3 * s.doc_id + 5 * g.i) % 30) AS chars
        FROM spec s, generate_series(0, 10) AS g(i)
        WHERE g.i < s.n
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_cues,
           CAST(sum(dur_ms) AS BIGINT) AS total_sub_ms,
           CAST(max(start_ms + dur_ms) - min(start_ms) AS BIGINT)
               AS span_ms,
           CAST(sum(chars) AS BIGINT) AS n_chars,
           CAST(sum(CASE WHEN i < n - 1 AND dur_ms > 2000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overlaps,
           CAST(sum(chars) * 1000 // sum(dur_ms) AS BIGINT)
               AS chars_per_sec
    FROM cues GROUP BY doc_id, n
    """,
)
def m_srt_parse(spark, sf_dir):
    """REAL subtitle parsing, end to end: each doc becomes a genuine
    SubRip (.srt) file — numbered blocks, `HH:MM:SS,mmm --> HH:MM:SS,mmm`
    timecode lines, text payload, blank-line separators — and a second
    Arrow stage parses those BYTES back with a real block splitter +
    timecode regex, computing every output from the parsed cues: cue
    count, summed subtitle time, first-start→last-end span, text chars,
    OVERLAP count (next cue starts before this one ends — the caption-QA
    signal real pipelines gate on), and reading speed in chars/sec (the
    accessibility limit, ~17-20 cps broadcast standard). A flipped digit
    in any timecode changes the result; the oracle replays the cue
    generator formulas without ever seeing the bytes — the m_wav_decode
    contract applied to the subtitle modality that video training
    corpora (caption alignment, CC filtering) actually parse at scale.

    Scale: synth and parse are one mapInPandas chain — the .srt bytes
    never shuffle; only (doc, 6 BIGINTs) rows reach the exchange. With
    real subtitle sidecars the synth stage becomes the blob scan and
    the parser is unchanged.
    """
    import re

    def synth_srt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Write a REAL .srt per doc: cue i starts at i*2000 + (d%997) ms,
        lasts 900 + ((d*7+i*13)%1500) ms, text = 10+((3d+5i)%30) chars."""

        def ts(ms: int) -> str:
            h, rem = divmod(ms, 3600000)
            m, rem = divmod(rem, 60000)
            s, milli = divmod(rem, 1000)
            return f"{h:02d}:{m:02d}:{s:02d},{milli:03d}"

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = (d % 8) + 3
                blocks = []
                for i in range(n):
                    start = i * 2000 + (d % 997)
                    dur = 900 + ((d * 7 + i * 13) % 1500)
                    nchars = 10 + ((3 * d + 5 * i) % 30)
                    text = ("subtitle" * 6)[:nchars]
                    blocks.append(
                        f"{i + 1}\n{ts(start)} --> {ts(start + dur)}\n"
                        f"{text}\n"
                    )
                payloads.append("\n".join(blocks).encode("utf-8"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    tc = re.compile(
        r"(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> "
        r"(\d{2}):(\d{2}):(\d{2}),(\d{3})"
    )

    def parse_srt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """REAL SubRip parser: block split, timecode regex, text lines."""

        def ms(h, m, s, milli):
            return ((int(h) * 60 + int(m)) * 60 + int(s)) * 1000 + int(milli)

        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_cues", "total_sub_ms", "span_ms", "n_chars",
                "n_overlaps", "chars_per_sec",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                cues = []
                for block in bytes(payload).decode("utf-8").split("\n\n"):
                    lines = [ln for ln in block.split("\n") if ln]
                    if len(lines) < 3:
                        continue
                    m = tc.fullmatch(lines[1])
                    assert m, f"bad timecode line: {lines[1]!r}"
                    start = ms(*m.groups()[:4])
                    end = ms(*m.groups()[4:])
                    cues.append((start, end, sum(len(t) for t in lines[2:])))
                cues.sort()
                total = sum(e - s for s, e, _ in cues)
                chars = sum(c for _, _, c in cues)
                overlaps = sum(
                    1
                    for (s0, e0, _), (s1, _, _) in zip(cues, cues[1:])
                    if s1 < e0
                )
                out["doc_id"].append(doc_id)
                out["n_cues"].append(len(cues))
                out["total_sub_ms"].append(total)
                out["span_ms"].append(cues[-1][1] - cues[0][0])
                out["n_chars"].append(chars)
                out["n_overlaps"].append(overlaps)
                out["chars_per_sec"].append(chars * 1000 // total)
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    srts = docs.mapInPandas(synth_srt, schema="doc_id long, payload binary")
    return srts.mapInPandas(parse_srt, schema=_SRT_SCHEMA)


_CHIST_SCHEMA = (
    "doc_id long, n_pixels long, r_b0 long, r_b1 long, r_b2 long, "
    "r_b3 long, dominant_bucket long, sum_luma long"
)


@register(
    "m_color_histogram",
    """
    WITH spec AS (
        SELECT doc_id,
               (doc_id % 20) + 8 AS w,
               (doc_id % 12) + 6 AS h
        FROM documents
    ),
    px AS (
        SELECT s.doc_id, s.w, s.h,
               (s.doc_id + 3 * gx.x + 7 * gy.y) % 256 AS r,
               (2 * s.doc_id + 5 * gx.x + gy.y) % 256 AS g,
               (3 * s.doc_id + gx.x + 11 * gy.y) % 256 AS b
        FROM spec s, generate_series(0, 27) AS gx(x),
             generate_series(0, 17) AS gy(y)
        WHERE gx.x < s.w AND gy.y < s.h
    ),
    hist AS (
        SELECT doc_id,
               CAST(w * h AS BIGINT) AS n_pixels,
               CAST(sum(CASE WHEN r // 64 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS r_b0,
               CAST(sum(CASE WHEN r // 64 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS r_b1,
               CAST(sum(CASE WHEN r // 64 = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS r_b2,
               CAST(sum(CASE WHEN r // 64 = 3 THEN 1 ELSE 0 END) AS BIGINT)
                   AS r_b3,
               CAST(sum(r + g + b) AS BIGINT) AS sum_luma
        FROM px GROUP BY doc_id, w, h
    )
    SELECT doc_id, n_pixels, r_b0, r_b1, r_b2, r_b3,
           CAST(CASE WHEN r_b0 >= r_b1 AND r_b0 >= r_b2 AND r_b0 >= r_b3
                     THEN 0
                     WHEN r_b1 >= r_b2 AND r_b1 >= r_b3 THEN 1
                     WHEN r_b2 >= r_b3 THEN 2 ELSE 3 END AS BIGINT)
               AS dominant_bucket,
           sum_luma
    FROM hist
    """,
)
def m_color_histogram(spark, sf_dir):
    """Color-histogram features over REAL decoded P6 pixels: the
    m_ppm_decode round-trip (genuine header tokenizer + raster reshape)
    feeding a 4-bucket red-channel histogram (value div 64), the
    dominant bucket (lowest-bucket tiebreak), and the summed
    r+g+b luma — the cheap global color signature image dedup and
    near-duplicate triage use BEFORE any perceptual hash (a histogram
    distance prunes the m_image_dhash candidate set the way minhash
    bands prune Jaccard pairs). Every number is computed from decoded
    bytes; the oracle replays the pixel generator formula.

    Scale: one mapInPandas chain — rasters never shuffle, each doc
    forwards exactly 8 BIGINTs; bucketing is a numpy bincount per
    image inside the Arrow batch. With real images the decode stage
    swaps in a codec and the histogram/bincount stage is unchanged.
    """
    import numpy as np

    def synth_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = (d % 20) + 8, (d % 12) + 6
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                r = (d + 3 * x + 7 * y) % 256
                g = (2 * d + 5 * x + y) % 256
                b = (3 * d + x + 11 * y) % 256
                raster = np.stack(
                    np.broadcast_arrays(r, g, b), axis=-1
                ).astype(np.uint8)
                payloads.append(
                    f"P6\n{w} {h}\n255\n".encode() + raster.tobytes()
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def hist_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_pixels", "r_b0", "r_b1", "r_b2", "r_b3",
                "dominant_bucket", "sum_luma",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                assert buf[0:2] == b"P6", "not a P6 PPM"
                fields, pos = [], 2
                while len(fields) < 3:
                    while buf[pos] in b" \t\r\n":
                        pos += 1
                    start = pos
                    while buf[pos] not in b" \t\r\n":
                        pos += 1
                    fields.append(int(buf[start:pos]))
                pos += 1
                w, h, maxval = fields
                assert maxval == 255
                raster = np.frombuffer(
                    buf, dtype=np.uint8, count=3 * w * h, offset=pos
                ).reshape(h, w, 3).astype(np.int64)
                buckets = np.bincount(
                    (raster[:, :, 0] // 64).ravel(), minlength=4
                )
                out["doc_id"].append(doc_id)
                out["n_pixels"].append(w * h)
                for bi in range(4):
                    out[f"r_b{bi}"].append(int(buckets[bi]))
                out["dominant_bucket"].append(int(buckets.argmax()))
                out["sum_luma"].append(int(raster.sum()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    ppms = docs.mapInPandas(synth_ppm, schema="doc_id long, payload binary")
    return ppms.mapInPandas(hist_ppm, schema=_CHIST_SCHEMA)


_ID3_SCHEMA = (
    "doc_id long, has_tag long, title_len long, artist_len long, "
    "year long, track long, genre_id long, comment_len long"
)


@register(
    "m_id3v1_tags",
    """
    SELECT doc_id,
           CAST(1 AS BIGINT) AS has_tag,
           CAST(8 + (doc_id % 23) AS BIGINT) AS title_len,
           CAST(5 + (doc_id % 17) AS BIGINT) AS artist_len,
           CAST(1990 + (doc_id % 35) AS BIGINT) AS year,
           CAST(1 + (doc_id % 12) AS BIGINT) AS track,
           CAST(doc_id % 80 AS BIGINT) AS genre_id,
           CAST(4 + (doc_id % 19) AS BIGINT) AS comment_len
    FROM documents
    """,
)
def m_id3v1_tags(spark, sf_dir):
    """REAL ID3v1 sidecar parsing: each doc becomes an MPEG-ish binary
    payload with a genuine 128-byte ID3v1.1 trailer (the 'TAG' magic,
    30-byte NUL-padded title/artist/album fields, 4-char year, 28-byte
    comment, the v1.1 zero-byte + track marker, 1-byte genre) and a
    second Arrow stage parses the LAST 128 BYTES back — magic check,
    fixed-offset field slicing, NUL-strip, the v1.1 track-byte rule
    (comment[28] == 0 distinguishes a track number from a 30-byte
    comment). Every output is read out of the decoded trailer; the
    oracle replays the field-generator formulas without touching
    bytes — the m_wav_decode contract applied to the metadata sidecar
    every audio-corpus ingest actually reads (genre/year/track are
    the deterministic join keys audio training sets are bucketed by).

    Scale: one mapInPandas chain — payload bytes never shuffle, each
    doc forwards 7 BIGINTs; parsing is O(128) per doc regardless of
    payload size, which is the whole point of trailer metadata.
    """

    def synth_id3(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Append a REAL ID3v1.1 trailer to junk audio bytes; field
        lengths/values are linear-congruential in doc_id."""

        def pad(s: str, n: int) -> bytes:
            b = s.encode("ascii")[:n]
            return b + b"\x00" * (n - len(b))

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                title = "t" * (8 + d % 23)
                artist = "a" * (5 + d % 17)
                album = "b" * (6 + d % 20)
                year = str(1990 + d % 35)
                comment = "c" * (4 + d % 19)
                track = 1 + d % 12
                genre = d % 80
                body = bytes((d + i) % 256 for i in range(64))  # junk MPEG
                tag = (
                    b"TAG"
                    + pad(title, 30)
                    + pad(artist, 30)
                    + pad(album, 30)
                    + year.encode("ascii")
                    + pad(comment, 28)
                    + b"\x00"
                    + bytes([track])
                    + bytes([genre])
                )
                assert len(tag) == 128
                payloads.append(body + tag)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def parse_id3(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """REAL trailer parser: last-128-byte slice, magic, offsets."""
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "has_tag", "title_len", "artist_len", "year",
                "track", "genre_id", "comment_len",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                tag = buf[-128:]
                ok = tag[0:3] == b"TAG"
                assert ok, "missing ID3v1 magic"
                title = tag[3:33].rstrip(b"\x00")
                artist = tag[33:63].rstrip(b"\x00")
                year = int(tag[93:97].decode("ascii"))
                comment = tag[97:125].rstrip(b"\x00")
                # v1.1 rule: byte 125 == 0 means byte 126 is a track no.
                is_v11 = tag[125] == 0
                track = tag[126] if is_v11 else 0
                genre = tag[127]
                out["doc_id"].append(doc_id)
                out["has_tag"].append(1)
                out["title_len"].append(len(title))
                out["artist_len"].append(len(artist))
                out["year"].append(year)
                out["track"].append(int(track))
                out["genre_id"].append(int(genre))
                out["comment_len"].append(len(comment))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    blobs = docs.mapInPandas(synth_id3, schema="doc_id long, payload binary")
    return blobs.mapInPandas(parse_id3, schema=_ID3_SCHEMA)


_ULAW_SCHEMA = (
    "doc_id long, n_samples long, sum_pcm long, sum_abs long, "
    "min_pcm long, max_pcm long"
)


@register(
    "m_ulaw_decode",
    """
    WITH spec AS (
        SELECT doc_id, (doc_id % 40) + 20 AS n
        FROM documents
    ),
    bytes_ AS (
        SELECT doc_id,
               CAST((doc_id * 37 + i * 11) % 256 AS BIGINT) AS b
        FROM spec, unnest(range(0, n)) AS t(i)
    ),
    dec AS (
        SELECT doc_id,
               CASE WHEN (255 - b) >= 128
                    THEN 132 - ((((255 - b) % 16) * 8 + 132)
                                << (((255 - b) // 16) % 8))
                    ELSE ((((255 - b) % 16) * 8 + 132)
                          << (((255 - b) // 16) % 8)) - 132
               END AS x
        FROM bytes_
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(x) AS BIGINT) AS sum_pcm,
           CAST(sum(abs(x)) AS BIGINT) AS sum_abs,
           CAST(min(x) AS BIGINT) AS min_pcm,
           CAST(max(x) AS BIGINT) AS max_pcm
    FROM dec GROUP BY doc_id ORDER BY doc_id LIMIT 200
    """,
)
def m_ulaw_decode(spark, sf_dir):
    """REAL G.711 µ-law audio decode (CCITT, the classic Sun ulaw.c
    expansion, public): each doc becomes a deterministic µ-law byte
    stream (the telephony/8kHz wire format), and a second Arrow stage
    expands every byte to its 16-bit PCM value with the genuine
    bit-field decode — complement, mantissa<<3+bias, segment shift,
    sign — NOT a lookup table, so a flipped bit anywhere changes the
    output. The companded-audio sibling of m_wav_decode (linear PCM
    container walk): ingest pipelines meet µ-law in call-center/telecom
    corpora where storage is byte-per-sample.

    Exactness: the oracle replays the byte generator AND the exact
    integer expansion in SQL (integer shifts on both engines); decode
    outputs are pure BIGINTs — no floats anywhere.

    Scale shape: synth and decode are both mapInPandas over the same
    partitioning — payload bytes never shuffle; only six BIGINTs per
    doc reach the exchange. With real ingested audio the synth stage
    is the blob-store scan; the decode stage is unchanged.
    """
    import numpy as np

    # Stages defined inside the query fn so cloudpickle ships them by
    # value (executor workers cannot import this package).
    def synth_ulaw(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n = (d % 40) + 20
                payloads.append(
                    bytes((d * 37 + i * 11) % 256 for i in range(n))
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode_ulaw(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = None
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "n_samples", "sum_pcm", "sum_abs",
                "min_pcm", "max_pcm",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                u = (~b).astype(np.int64) & 0xFF
                t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
                x = np.where((u & 0x80) != 0, 0x84 - t, t - 0x84)
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(len(x))
                out["sum_pcm"].append(int(x.sum()))
                out["sum_abs"].append(int(np.abs(x).sum()))
                out["min_pcm"].append(int(x.min()))
                out["max_pcm"].append(int(x.max()))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    raw = docs.mapInPandas(synth_ulaw, schema="doc_id long, payload binary")
    return (
        raw.mapInPandas(decode_ulaw, schema=_ULAW_SCHEMA)
        .orderBy("doc_id")
        .limit(200)
    )


_BMP_SCHEMA = (
    "doc_id long, file_size long, width long, height long, "
    "pad_bytes long, sum_b long, sum_g long, sum_r long"
)


@register(
    "m_bmp_decode",
    """
    WITH spec AS (
        SELECT doc_id, (doc_id % 9) + 4 AS w, (doc_id % 7) + 3 AS h
        FROM documents
    ),
    px AS (
        SELECT s.doc_id, s.w, s.h,
               CAST((s.doc_id * 13 + x.x * 7 + y.y * 31) % 256 AS BIGINT)
                   AS b,
               CAST((s.doc_id * 13 + x.x * 7 + y.y * 31 + 97) % 256
                    AS BIGINT) AS g,
               CAST((s.doc_id * 13 + x.x * 7 + y.y * 31 + 194) % 256
                    AS BIGINT) AS r
        FROM spec s,
             LATERAL (SELECT unnest(range(0, s.w)) AS x) x,
             LATERAL (SELECT unnest(range(0, s.h)) AS y) y
    )
    SELECT doc_id,
           CAST(54 + (w * 3 + (4 - (w * 3) % 4) % 4) * h AS BIGINT)
               AS file_size,
           CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(((4 - (w * 3) % 4) % 4) * h AS BIGINT) AS pad_bytes,
           CAST(sum(b) AS BIGINT) AS sum_b,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(r) AS BIGINT) AS sum_r
    FROM px GROUP BY doc_id, w, h ORDER BY doc_id LIMIT 200
    """,
)
def m_bmp_decode(spark, sf_dir):
    """REAL BMP (Windows DIB) decode end to end: each doc becomes a
    genuine 24-bpp bottom-up BMP — real BITMAPFILEHEADER ('BM', file
    size, pixel offset 54), real 40-byte BITMAPINFOHEADER
    (little-endian width/height/planes/bpp), and the format's
    signature quirk: every pixel row padded to a 4-byte boundary, rows
    stored bottom-up, channels ordered BGR. A second Arrow stage
    parses those bytes back with struct unpacks and a padded-row walk
    — a flipped byte in header, padding or payload changes the result
    (the m_wav_decode honesty bar). Only the pixel CONTENT is
    synthetic, which is what lets the oracle recompute the channel
    sums from the generator formula plus the padding arithmetic.

    Scale shape: synth and decode are both mapInPandas over the same
    partitioning — image bytes never shuffle; only 8 BIGINTs per doc
    reach the exchange. With real ingested images the synth stage is
    the blob-store scan; the decode stage is unchanged.
    """
    import struct

    import numpy as np

    def synth_bmp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = (d % 9) + 4, (d % 7) + 3
                rowbytes = w * 3
                pad = (4 - rowbytes % 4) % 4
                body = bytearray()
                for y in range(h - 1, -1, -1):  # bottom-up storage
                    for x in range(w):
                        base = d * 13 + x * 7 + y * 31
                        body += bytes(
                            ((base + k * 97) % 256 for k in range(3))
                        )  # B, G, R
                    body += b"\x00" * pad
                size = 54 + len(body)
                hdr = (
                    b"BM"
                    + struct.pack("<IHHI", size, 0, 0, 54)
                    + struct.pack(
                        "<IiiHHIIiiII",
                        40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0,
                    )
                )
                payloads.append(bytes(hdr) + bytes(body))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    def decode_bmp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "file_size", "width", "height", "pad_bytes",
                "sum_b", "sum_g", "sum_r",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                assert buf[0:2] == b"BM", "not a BMP"
                size, _, _, off = struct.unpack("<IHHI", buf[2:14])
                (hsz, w, h, planes, bpp) = struct.unpack(
                    "<IiiHH", buf[14:30]
                )
                assert hsz == 40 and planes == 1 and bpp == 24
                rowbytes = w * 3
                pad = (4 - rowbytes % 4) % 4
                sums = np.zeros(3, dtype=np.int64)
                pos = off
                for _y in range(h):
                    row = np.frombuffer(
                        buf[pos: pos + rowbytes], dtype=np.uint8
                    ).astype(np.int64)
                    sums += row.reshape(w, 3).sum(axis=0)
                    pos += rowbytes + pad
                out["doc_id"].append(int(doc_id))
                out["file_size"].append(size)
                out["width"].append(w)
                out["height"].append(h)
                out["pad_bytes"].append(pad * h)
                out["sum_b"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_r"].append(int(sums[2]))
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    raw = docs.mapInPandas(synth_bmp, schema="doc_id long, payload binary")
    return (
        raw.mapInPandas(decode_bmp, schema=_BMP_SCHEMA)
        .orderBy("doc_id")
        .limit(200)
    )
