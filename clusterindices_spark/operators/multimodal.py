"""Multimodal binary-column plumbing (task north star).

Images/audio/video are opaque ``binary`` columns with typed metadata. The
Spark-side machinery — schema, Arrow batching via mapInPandas, partitioning —
is real and tested. Two decode tiers:

- ``mode="fake"`` derives deterministic pseudo-metadata from the raw bytes
  so the pipeline shape is exercised end-to-end on any payload.
- ``mode="real"`` ACTUALLY DECODES the two formats a pure-stdlib parser can
  handle — binary PPM (P6) images and RIFF/WAV PCM audio (struct-based
  header walk + sample decode, no third-party libs). Payloads in any other
  format hit an explicit NotImplementedError: that is the seam where
  PIL/torchaudio/ffmpeg plug in for jpeg/png/mp3/mp4 (not installed in
  this container). ``synth_media`` plants real PPM/WAV payloads generated
  from doc_id arithmetic, so the DuckDB oracle can replay the decoded
  sample statistics without ever seeing the bytes — a header-offset or
  endianness bug in the parser breaks the value hash.

``multimodal_meta`` is oracle-checked: byte-level metadata (length, first
byte) is SQL-computable in DuckDB over the same UTF-8 bytes, which validates
that the Arrow round-trip through pandas preserves the binary payload
byte-for-byte.

Scale: mapInPandas streams Arrow batches (no per-row Python); keep batches
~10k rows via spark.sql.execution.arrow.maxRecordsPerBatch. Binary payloads
make rows wide — repartition by size (bytes), not row count, before decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clusterindices_spark.sources.fixtures import fan_out, load_table

DECODE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, first_byte INT, fake_width INT, fake_height INT"
)


def with_binary_payload(d: DataFrame, fan: bool = True) -> DataFrame:
    """documents with an opaque binary column (UTF-8 bytes of text stand in
    for a media payload) + typed metadata, the multimodal table shape.

    fan_out first: every consumer feeds Arrow-batched Python (mapInPandas /
    mapInArrow), where a 1-partition input means zero parallelism. Pass
    ``fan=False`` when the consumer repartitions itself anyway (e.g.
    decode_binary with ``target_partition_bytes``) — stacking both would
    shuffle every payload byte twice."""
    if fan:
        d = fan_out(d)
    # media-payload contract (r9 hostile edge): a document without text
    # has no payload — excluded here and in every multimodal oracle
    # (WHERE text IS NOT NULL), so the Arrow UDFs never see a None
    # payload (they crashed on len(None) across the whole family)
    d = d.where(F.col("text").isNotNull())
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("lang").alias("media_lang"),
            F.col("source").alias("media_source"),
        ).alias("meta"),
    )


def decode_binary(
    binary_df: DataFrame,
    mode: str = "fake",
    target_partition_bytes: int | None = None,
) -> DataFrame:
    """Arrow-batched 'decode' of a binary payload column via mapInPandas.

    mode="real" routes to ``decode_media`` (stdlib PPM/WAV parsers; other
    formats raise at the documented PIL/ffmpeg seam) and returns
    REAL_DECODE_SCHEMA; mode="fake" computes deterministic metadata from
    the raw bytes and returns DECODE_SCHEMA.

    ``target_partition_bytes`` opts into byte-weighted repartitioning
    (fixtures.fan_out_by_bytes) before the decode: media rows vary by
    orders of magnitude (thumbnail vs video), so production decodes size
    partitions by Σ payload bytes, not row count. Left off for the fixture
    corpus, whose rows are uniformly narrow.
    """
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode {mode!r}")
    if target_partition_bytes is not None:
        from clusterindices_spark.sources.fixtures import fan_out_by_bytes

        binary_df = fan_out_by_bytes(
            binary_df, F.octet_length("payload"), target_partition_bytes
        )

    if mode == "real":
        return decode_media(binary_df)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    # deterministic fake decode: pretend bytes are a square-ish
                    # image; real decode would read the actual header
                    "fake_width": payloads.map(
                        lambda b: int(len(b) ** 0.5)
                    ).astype("int32"),
                    "fake_height": payloads.map(
                        lambda b: (len(b) // max(int(len(b) ** 0.5), 1))
                    ).astype("int32"),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        _decode, schema=DECODE_SCHEMA
    )


# ---------------------------------------------------------------------------
# real decode tier: stdlib PPM (P6) + RIFF/WAV PCM parsers
# ---------------------------------------------------------------------------

PPM_W, PPM_H = 4, 4  # planted image dims (48 RGB bytes)
WAV_N, WAV_RATE = 32, 8000  # planted clip: 32 samples of 16-bit mono PCM
REAL_DECODE_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, "
    "n_samples int, sample_rate int, value_sum bigint, value_peak int"
)


def _synth_ppm(doc_id: int) -> bytes:
    """Binary PPM (P6): planted pixel bytes are pure doc_id arithmetic so
    the oracle can replay the decoded stats without seeing the bytes."""
    pix = bytes(
        (doc_id * 31 + i * 7) % 256 for i in range(PPM_W * PPM_H * 3)
    )
    return f"P6\n{PPM_W} {PPM_H}\n255\n".encode("ascii") + pix


def _synth_wav(doc_id: int) -> bytes:
    """Minimal RIFF/WAVE with one fmt chunk (PCM, mono, 16-bit) and one
    data chunk of WAV_N planted samples."""
    import struct

    samples = [
        ((doc_id * 13 + i * 5) % 65536) - 32768 for i in range(WAV_N)
    ]
    data = struct.pack(f"<{WAV_N}h", *samples)
    byte_rate = WAV_RATE * 2
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_RATE, byte_rate, 2, 16)
    riff_size = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF"
        + struct.pack("<I", riff_size)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synth_media(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): plant REAL media bytes — PPM for even doc_ids,
    WAV for odd — via Arrow-batched mapInPandas. This is the test-fixture
    encoder for the real-decode tier; a production pipeline lands actual
    media files in the binary column instead."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": [
                        _synth_ppm(int(i)) if int(i) % 2 == 0 else _synth_wav(int(i))
                        for i in ids
                    ],
                }
            )

    return docs.select("doc_id").mapInPandas(
        _synth, schema="doc_id bigint, payload binary"
    )


def _parse_ppm(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse binary PPM (P6): header tokens (magic, width, height, maxval)
    separated by whitespace, then raw RGB bytes. Returns
    (width, height, maxval, pixels)."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = (int(t) for t in tokens)
    pixels = data[pos : pos + w * h * 3]
    if len(pixels) != w * h * 3:
        raise ValueError(f"PPM raster truncated: {len(pixels)} of {w * h * 3}")
    return w, h, maxval, pixels


def _parse_wav(data: bytes) -> tuple[int, int, int, list[int]]:
    """Walk a RIFF/WAVE chunk list; decode the PCM data chunk. Returns
    (n_channels, sample_rate, bits, samples). 16-bit little-endian only —
    the seam raises for other encodings."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    n_channels = sample_rate = bits = None
    samples: list[int] | None = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, n_channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body
            )
            if audio_fmt != 1:
                raise ValueError(f"non-PCM WAV (format {audio_fmt})")
        elif cid == b"data":
            if bits != 16:
                raise ValueError(f"only 16-bit PCM supported, got {bits}")
            samples = list(struct.unpack(f"<{size // 2}h", body[: size // 2 * 2]))
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if samples is None or n_channels is None:
        raise ValueError("WAV missing fmt/data chunk")
    return n_channels, sample_rate, bits, samples


def decode_media(binary_df: DataFrame) -> DataFrame:
    """REAL decode of a binary media column (Arrow-batched mapInPandas):
    PPM images → dims + pixel-byte stats; WAV PCM → sample stats. Any
    other payload raises NotImplementedError — the explicit seam where
    real media decode libs (PIL/torchaudio/ffmpeg) plug in for
    jpeg/png/mp3/mp4; they are not available in this container."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b.startswith(b"P6"):
                    w, h, maxval, pix = _parse_ppm(b)
                    rows.append(
                        (doc_id, "ppm", w, h, len(pix), None, sum(pix), max(pix))
                    )
                elif b.startswith(b"RIFF"):
                    _, rate, _, samples = _parse_wav(b)
                    rows.append(
                        (
                            doc_id,
                            "wav",
                            None,
                            None,
                            len(samples),
                            rate,
                            sum(samples),
                            max(abs(s) for s in samples),
                        )
                    )
                else:
                    raise NotImplementedError(
                        "unrecognized media format; real media decode libs "
                        "(PIL/torchaudio/ffmpeg) plug in here"
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "fmt",
                    "width",
                    "height",
                    "n_samples",
                    "sample_rate",
                    "value_sum",
                    "value_peak",
                ],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        _decode, schema=REAL_DECODE_SCHEMA
    )


def q_multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return decode_media(synth_media(d))


FRAME_CHARS = 64  # "frame" width in decoded units
FRAME_STRIDE = 4  # sample every 4th frame
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_len int, frame_hash bigint"
_FNV_MOD = 1_000_000_007


def frame_sample(binary_df: DataFrame) -> DataFrame:
    """Frame-sampling plumbing: slice the decoded payload into fixed-width
    frames, keep every FRAME_STRIDE-th, and emit a per-frame feature (the
    repo's rolling codepoint hash — the stand-in for a real per-frame
    embedding). Row→rows expansion in Arrow-batched Python, the exact shape
    of video frame extraction; the fake 'decode' is utf-8, so a DuckDB
    oracle replays the slicing and hash character-for-character (no ASCII
    coupling — both sides slice by decoded units)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                n_frames = (len(text) + FRAME_CHARS - 1) // FRAME_CHARS
                for i in range(0, n_frames, FRAME_STRIDE):
                    seg = text[i * FRAME_CHARS : (i + 1) * FRAME_CHARS]
                    h = 0
                    for ch in seg:
                        h = (h * 31 + ord(ch)) % _FNV_MOD
                    ids.append(doc_id)
                    idxs.append(i)
                    lens.append(len(seg))
                    hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="int64"),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        _frames, schema=FRAME_SCHEMA
    )


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return frame_sample(with_binary_payload(d))


SCENE_TAU_MILLI = 1500  # mean-codepoint delta (×1000) that counts as a cut


def scene_cuts(binary_df: DataFrame) -> DataFrame:
    """Scene-change detection over the sampled frame sequence: a cut is a
    jump in mean frame intensity (here mean codepoint of the fake-decoded
    frame, integer milli-units — floor division, so both engines agree
    bit-exactly) beyond SCENE_TAU_MILLI between CONSECUTIVE SAMPLED
    frames. The real-video shape: per-frame feature in Arrow-batched
    Python (the decode boundary), then the temporal logic — lag window,
    threshold, per-title summary — stays JVM-side."""

    def _energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, emilli = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                n_frames = (len(text) + FRAME_CHARS - 1) // FRAME_CHARS
                for i in range(0, n_frames, FRAME_STRIDE):
                    seg = text[i * FRAME_CHARS : (i + 1) * FRAME_CHARS]
                    ids.append(doc_id)
                    idxs.append(i)
                    emilli.append(
                        sum(ord(c) for c in seg) * 1000 // len(seg)
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "e_milli": pd.Series(emilli, dtype="int64"),
                }
            )

    frames = binary_df.select("doc_id", "payload").mapInPandas(
        _energies, schema="doc_id bigint, frame_idx int, e_milli bigint"
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    delta = F.abs(F.col("e_milli") - F.lag("e_milli").over(w))
    per_frame = frames.withColumn("delta_milli", delta)
    return per_frame.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.coalesce(
            F.sum((F.col("delta_milli") > SCENE_TAU_MILLI).cast("bigint")),
            F.lit(0).cast("bigint"),
        ).alias("n_cuts"),
        F.max("delta_milli").alias("max_delta_milli"),
    )


def q_multimodal_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return scene_cuts(with_binary_payload(d))



def q_multimodal_type_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-type routing by magic bytes: sniff each planted payload's
    container from its header (P6 PPM vs RIFF/WAVE vs unknown) with pure
    scan-side hex comparisons — the dispatch stage in front of the typed
    decoders (decode_media raises on formats this router would send to a
    different pool). Reports per-format counts and byte mass. The oracle
    replays the synth rule (doc_id parity) relationally — a router bug
    that mis-sniffs either header breaks the hash."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    media = synth_media(d)
    head2 = F.upper(F.hex(F.substring(F.col("payload"), 1, 2)))
    head4 = F.upper(F.hex(F.substring(F.col("payload"), 1, 4)))
    fmt = (
        F.when(head2 == "5036", "ppm")        # 'P6'
        .when(head4 == "52494646", "wav")     # 'RIFF'
        .otherwise("unknown")
    )
    return (
        media.select(fmt.alias("fmt"), F.octet_length("payload").alias("nb"))
        .groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n_payloads"),
            F.sum(F.col("nb").cast("bigint")).alias("total_bytes"),
        )
    )


SILENCE_THRESHOLD = 8192  # |sample| below this counts as quiet (of ±32768)


def audio_silence(binary_df: DataFrame) -> DataFrame:
    """Silence/VAD-style profiling of PCM clips: per clip, how many
    samples sit under the quiet threshold and the LONGEST consecutive
    quiet run — the trim-silence / voice-activity precursor every audio
    pipeline runs before feature extraction. Decode + run-length logic in
    Arrow-batched Python (the sequential run scan is the part SQL
    windows do with gaps-and-islands — the oracle replays it that way);
    everything after is a plain DataFrame.

    Scale: one mapInPandas pass over the payload column, no shuffle."""

    def _silence(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                _, _, _, samples = _parse_wav(b)
                quiet = [abs(s) < SILENCE_THRESHOLD for s in samples]
                run = best = 0
                for q in quiet:
                    run = run + 1 if q else 0
                    best = max(best, run)
                rows.append((doc_id, len(samples), sum(quiet), best))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "n_quiet", "longest_quiet_run"],
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        _silence,
        schema="doc_id bigint, n_samples int, n_quiet int, longest_quiet_run int",
    )


def q_multimodal_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face of audio_silence over the planted WAV tier (odd
    doc_ids); quiet_frac is appended JVM-side. The oracle replays the
    synth sample formula arithmetically and derives the longest run with
    gaps-and-islands — a decoder bug anywhere (RIFF walk, 16-bit unpack,
    run scan) breaks the hash."""
    from clusterindices_spark.functions.aggregates import round6_stable

    d = load_table(spark, sf_dir, "documents").select("doc_id").where(
        # pmod parity, matching the Python synth router's % (pmod-like):
        # Spark's sign-preserving % gives -1 for negative odds and
        # silently dropped them from the WAV tier (fuzz gate 101001)
        F.pmod(F.col("doc_id"), F.lit(2)) == 1
    )
    out = audio_silence(synth_media(fan_out(d)))
    return out.select(
        "doc_id",
        "n_samples",
        "n_quiet",
        "longest_quiet_run",
        round6_stable(
            F.col("n_quiet").cast("double") / F.col("n_samples")
        ).alias("quiet_frac"),
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked slice of the decode output: byte length + first byte
    must equal DuckDB's view of the same UTF-8 payload."""
    d = load_table(spark, sf_dir, "documents")
    return decode_binary(with_binary_payload(d)).select(
        "doc_id", "n_bytes", "first_byte"
    )


BYTES_ARROW_SCHEMA = (
    "doc_id bigint, n_bytes bigint, head_byte int, tail_byte int"
)


def bytes_stats_arrow(binary_df: DataFrame) -> DataFrame:
    """Byte-level payload stats via ``mapInArrow`` — the lowest Python
    boundary tier: the function receives raw ``pyarrow.RecordBatch``es and
    never converts to pandas. The loop body reads the BinaryArray's
    offsets/data buffers zero-copy through numpy — this buffer-level access
    is exactly what mapInArrow exists for (a pandas round-trip would copy
    every payload byte into Python objects).

    Emits (doc_id, n_bytes, head_byte, tail_byte); empty payloads → -1
    bytes sentinel, mirroring decode_binary's convention."""

    def _stats(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            arr = rb.column(rb.schema.get_field_index("payload"))
            ids = rb.column(rb.schema.get_field_index("doc_id"))
            # offset width follows the arrow type: binary carries int32
            # offsets, large_binary (spark.sql.execution.arrow.useLargeVarTypes)
            # int64 — hardcoding int32 would silently misread int64 buffers
            off_dtype = (
                np.int64 if pa.types.is_large_binary(arr.type) else np.int32
            )
            off0 = arr.offset
            offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
                off0 : off0 + len(arr) + 1
            ]
            lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
            data_buf = arr.buffers()[2]
            if data_buf is None or len(data_buf) == 0:
                head = np.full(len(arr), -1, dtype=np.int32)
                tail = np.full(len(arr), -1, dtype=np.int32)
            else:
                data = np.frombuffer(data_buf, dtype=np.uint8)
                hi = len(data) - 1
                head = np.where(
                    lens > 0,
                    data[np.clip(offsets[:-1], 0, hi)].astype(np.int32),
                    np.int32(-1),
                )
                tail = np.where(
                    lens > 0,
                    data[np.clip(offsets[1:] - 1, 0, hi)].astype(np.int32),
                    np.int32(-1),
                )
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(lens, type=pa.int64()),
                    pa.array(head, type=pa.int32()),
                    pa.array(tail, type=pa.int32()),
                ],
                names=["doc_id", "n_bytes", "head_byte", "tail_byte"],
            )

    return binary_df.select("doc_id", "payload").mapInArrow(
        _stats, BYTES_ARROW_SCHEMA
    )


def q_multimodal_bytes_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return bytes_stats_arrow(with_binary_payload(d))


AUDIO_WINDOW = 32  # analysis window width in decoded units
AUDIO_HOP = 24  # hop < width → 25% overlap (the STFT frame shape)
AUDIO_SCHEMA = (
    "doc_id bigint, win_start int, win_len int, energy bigint, peak int"
)


def audio_windows(binary_df: DataFrame) -> DataFrame:
    """Audio-analysis plumbing: overlapping fixed-width windows (hop <
    width, the STFT framing shape) over the decoded payload, with
    integer-exact per-window features — energy = Σ code², peak = max code
    (stand-ins for RMS/peak over real samples; all-integer so the oracle
    can't drift). Same Arrow-batched row→rows expansion as frame_sample;
    a real decoder would swap the utf-8 'decode' for PCM samples."""

    def _wins(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, starts, lens, energies, peaks = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                for s in range(0, len(text), AUDIO_HOP):
                    seg = text[s : s + AUDIO_WINDOW]
                    codes = [ord(ch) for ch in seg]
                    ids.append(doc_id)
                    starts.append(s)
                    lens.append(len(seg))
                    energies.append(sum(c * c for c in codes))
                    peaks.append(max(codes) if codes else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_start": pd.Series(starts, dtype="int32"),
                    "win_len": pd.Series(lens, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int64"),
                    "peak": pd.Series(peaks, dtype="int32"),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        _wins, schema=AUDIO_SCHEMA
    )


def q_multimodal_audio_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return audio_windows(with_binary_payload(d))


AFP_BITS = 16


def q_multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic fingerprint over the audio-window tier: bit i of ``afp``
    set iff window-energy(i) < energy(i+1) (first AFP_BITS deltas) —
    the sign-of-energy-delta signature every audio-fingerprint family
    builds on, invariant under any monotone gain change (gain rescales
    energies, never reorders them). Grouped into the dedup report shape.

    Scale: the fingerprint is JVM HOF math over each doc's ≤17-window
    energy array (collect_list bounded by payload/hop); signatures
    shuffle 2 bytes with map-side combine."""
    d = load_table(spark, sf_dir, "documents")
    aw = audio_windows(with_binary_payload(d))
    per = aw.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("win_start", "energy"))),
            lambda s: s["energy"],
        ).alias("e")
    )
    n = F.least(F.greatest(F.size("e") - 1, F.lit(0)), F.lit(AFP_BITS))
    z = F.arrays_zip(
        F.slice("e", 1, n).alias("a"),
        F.slice("e", 2, n).alias("b"),
        F.slice(F.sequence(F.lit(0), F.lit(AFP_BITS - 1)), 1, n).alias("i"),
    )
    afp = F.aggregate(
        z,
        F.lit(0).cast("bigint"),
        # pow, not shiftleft: pyspark's shiftleft takes a PYTHON int for
        # the amount; 2^i is exact in double for i ≤ 16
        lambda acc, s: acc
        + F.when(
            s["a"] < s["b"],
            F.pow(F.lit(2.0), s["i"]).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    return (
        per.select("doc_id", afp.alias("afp"))
        .groupBy("afp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


RESIZE_SRC_W = 16  # fake-decoded image width (decoded units per row)
RESIZE_OUT = 4  # output is RESIZE_OUT × RESIZE_OUT
RESIZE_SCHEMA = "doc_id bigint, src_h int, pixels array<int>, checksum bigint"


def resize_nearest(binary_df: DataFrame) -> DataFrame:
    """Resize plumbing (the image-thumbnail shape): treat the decoded
    payload as a row-major RESIZE_SRC_W-wide pixel grid (full rows only)
    and nearest-neighbor downsample to RESIZE_OUT². All-integer index
    arithmetic — out(r,c) = grid(r·H÷4, c·W÷4) — so the DuckDB oracle
    replays it exactly; a real decoder would swap codepoints for pixel
    values, the sampling logic is unchanged."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, pix, cks = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                text = bytes(payload).decode("utf-8")
                h = len(text) // RESIZE_SRC_W
                if h < 1:
                    continue  # too small to form one full row
                out = []
                for r in range(RESIZE_OUT):
                    for c in range(RESIZE_OUT):
                        idx = (
                            (r * h) // RESIZE_OUT * RESIZE_SRC_W
                            + (c * RESIZE_SRC_W) // RESIZE_OUT
                        )
                        out.append(ord(text[idx]))
                ids.append(doc_id)
                hs.append(h)
                pix.append(out)
                cks.append(sum(out))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "src_h": pd.Series(hs, dtype="int32"),
                    "pixels": pd.Series(pix, dtype="object"),
                    "checksum": pd.Series(cks, dtype="int64"),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        _resize, schema=RESIZE_SCHEMA
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The registry emits `pixels` comma-joined into one STRING cell: the
    # driver's canonicalizer (pandas sort_values over all columns) cannot
    # hash list-typed cells (CORRECTNESS_r02 ERR). Integer CSV renders
    # identically in both engines; resize_nearest keeps the array form for
    # library users.
    d = load_table(spark, sf_dir, "documents")
    out = resize_nearest(with_binary_payload(d))
    return out.select(
        "doc_id",
        "src_h",
        F.concat_ws(
            ",", F.transform("pixels", lambda v: v.cast("string"))
        ).alias("pixels_csv"),
        "checksum",
    )


def q_multimodal_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup grouping for media (dHash): on the 4×4 thumbnail
    the resize tier already produces, hash the HORIZONTAL GRADIENT — bit j
    (j = r·3+c) set iff pixel(r,c) < pixel(r,c+1) — and group payloads by
    the 12-bit signature. Gradient hashes are the standard
    perceptual-dedup primitive: stable under uniform brightness shifts
    where a byte hash (dedup_exact) sees different content. Output is the
    dedup report shape (dhash, keep_doc_id, n_copies).

    Scale: the hash is 12 codegen comparisons on the thumbnail array (no
    extra Python beyond the shared resize pass); grouping shuffles 2-byte
    signatures with map-side combine."""
    return (
        _dhash_frame(spark, sf_dir)
        .groupBy("dhash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _dhash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, dhash) — the per-payload 12-bit gradient hash feeding both
    the exact-group key and the banded near-dup report."""
    d = load_table(spark, sf_dir, "documents")
    out = resize_nearest(with_binary_payload(d))
    bits = None
    for j in range(12):
        r, c = j // 3, j % 3
        term = F.when(
            F.get("pixels", r * RESIZE_OUT + c)
            < F.get("pixels", r * RESIZE_OUT + c + 1),
            F.lit(1).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")) * F.lit(1 << j).cast("bigint")
        bits = term if bits is None else bits + term
    return out.select("doc_id", bits.alias("dhash"))


NEARDUP_MAX_HAMMING = 2  # ≤2 differing gradient bits counts as a near-dup
_NEARDUP_BANDS = 3  # 3 × 4-bit bands: pigeonhole ⇒ FULL recall at ≤2 bits


def q_multimodal_near_dup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-payload perceptual near-dup degree report: how many OTHER
    payloads sit within NEARDUP_MAX_HAMMING gradient bits, the minimal
    distance, and a deterministic nearest exemplar — the triage view that
    ranks media by how templated it is (exact-dup groups are hamming 0;
    brightness-shifted re-encodes land at 1-2).

    The candidate generator is a BANDED equi-join (3 bands × 4 bits):
    two hashes within hamming ≤ 2 differ in ≤ 2 bands, so by pigeonhole
    they AGREE on ≥ 1 band — full recall, zero false negatives, and the
    join never compares hashes sharing no band. The ORACLE is the
    brute-force all-pairs popcount filter (definitional), so the gate
    certifies the banding argument, not just expression parity.

    Scale: band explode (3 rows/payload) → band-bucket equi-join →
    distinct pair table → exact popcount filter → per-doc agg; the only
    quadratic risk is a saturated band bucket, the same hot-bucket story
    every LSH tier here documents (cap or widen bands at real scale)."""
    h = _dhash_frame(spark, sf_dir)
    bands = h.select(
        "doc_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.shiftright(F.col("dhash"), 4 * i)
                        .bitwiseAND(F.lit(15))
                        .alias("bv"),
                    )
                    for i in range(_NEARDUP_BANDS)
                ]
            )
        ).alias("g"),
    ).select("doc_id", "dhash", F.col("g.bi").alias("bi"), F.col("g.bv").alias("bv"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("dhash").alias("ha"), "bi", "bv"
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("dhash").alias("hb"), "bi", "bv"
    )
    pairs = (
        a.join(b, ["bi", "bv"])
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
        .where(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            <= NEARDUP_MAX_HAMMING
        )
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("ham"),
        )
    )
    near = pairs.groupBy("doc_a").agg(
        F.count(F.lit(1)).alias("n_near"),
        F.min(F.struct("ham", "doc_b")).alias("best"),
    )
    return (
        h.join(near, h["doc_id"] == near["doc_a"], "left")
        .select(
            "doc_id",
            "dhash",
            F.coalesce(F.col("n_near"), F.lit(0).cast("bigint")).alias(
                "n_near"
            ),
            F.col("best.ham").cast("int").alias("min_hamming"),
            F.col("best.doc_b").alias("nearest_doc"),
        )
    )


QUERIES = {
    "multimodal_dhash": q_multimodal_dhash,
    "multimodal_near_dup_report": q_multimodal_near_dup_report,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_bytes_arrow": q_multimodal_bytes_arrow,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_audio_window": q_multimodal_audio_window,
    "multimodal_audio_fingerprint": q_multimodal_audio_fingerprint,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_decode_real": q_multimodal_decode_real,
    "multimodal_scene_cut": q_multimodal_scene_cut,
    "multimodal_type_routing": q_multimodal_type_routing,
    "multimodal_audio_silence": q_multimodal_audio_silence,
}

# first_byte is the first UTF-8 *byte*, not the first codepoint (they only
# coincide for ASCII). DuckDB can't index BLOBs, so derive the UTF-8 lead
# byte from the first codepoint: cp<128 → cp; <2048 → 0xC0|cp>>6;
# <65536 → 0xE0|cp>>12; else 0xF0|cp>>18. Empty text → -1, matching the
# Spark-side fake decode.
ORACLES = {
    "multimodal_meta": """
WITH cp AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         CASE WHEN length(text) = 0 THEN NULL
              ELSE unicode(substr(text, 1, 1)) END AS c
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(CASE WHEN c IS NULL THEN -1
                 WHEN c < 128 THEN c
                 WHEN c < 2048 THEN 192 + c // 64
                 WHEN c < 65536 THEN 224 + c // 4096
                 ELSE 240 + c // 262144 END AS INT) AS first_byte
FROM cp
""",
    # tail byte of a UTF-8 sequence: cp<128 → cp, else the final
    # continuation byte 0x80 | (cp & 0x3F)
    "multimodal_bytes_arrow": """
WITH cp AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         CASE WHEN length(text) = 0 THEN NULL
              ELSE unicode(substr(text, 1, 1)) END AS hc,
         CASE WHEN length(text) = 0 THEN NULL
              ELSE unicode(substr(text, length(text), 1)) END AS tc
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(CASE WHEN hc IS NULL THEN -1
                 WHEN hc < 128 THEN hc
                 WHEN hc < 2048 THEN 192 + hc // 64
                 WHEN hc < 65536 THEN 224 + hc // 4096
                 ELSE 240 + hc // 262144 END AS INT) AS head_byte,
       CAST(CASE WHEN tc IS NULL THEN -1
                 WHEN tc < 128 THEN tc
                 ELSE 128 + tc % 64 END AS INT) AS tail_byte
FROM cp
""",
}

from clusterindices_spark.functions.aggregates import SQL_ROUND6  # noqa: E402
from clusterindices_spark.functions.text import SQL_FINGERPRINT  # noqa: E402

_FRAME_EXPR = f"substr(text, frame_idx * {FRAME_CHARS} + 1, {FRAME_CHARS})"

ORACLES["multimodal_frame_sample"] = f"""
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(ceil(length(text) / {FRAME_CHARS}.0) AS BIGINT),
                      {FRAME_STRIDE})) AS frame_idx
  FROM documents WHERE text IS NOT NULL
    AND length(text) > 0
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(length({_FRAME_EXPR}) AS INT) AS frame_len,
       {SQL_FINGERPRINT.format(col=_FRAME_EXPR)} AS frame_hash
FROM f
"""

# payload byte sizes DERIVED from the synth encoders themselves (ADVICE r4:
# literal 59/108 would silently break the gate if synth_media's layout
# changed without touching the router under test). Sizes are doc_id-
# independent — fixed dims/sample count, fixed-width header digits.
_PPM_BYTES = len(_synth_ppm(0))
_WAV_BYTES = len(_synth_wav(1))

ORACLES["multimodal_type_routing"] = f"""
SELECT CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'wav' END AS fmt,
       COUNT(*) AS n_payloads,
       CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN {_PPM_BYTES} ELSE {_WAV_BYTES} END) AS BIGINT)
         AS total_bytes
FROM documents
GROUP BY CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'wav' END
"""

ORACLES["multimodal_audio_silence"] = f"""
WITH s AS (
  -- pmod forms + <>0 parity: the synth runs in PYTHON, whose % is
  -- pmod-like, while DuckDB's % is sign-preserving — negative doc_ids
  -- diverged in both membership and sample values (fuzz gate 101001)
  SELECT doc_id, i,
         (((doc_id * 13 + i * 5) % 65536) + 65536) % 65536 - 32768 AS v
  FROM (SELECT doc_id, unnest(range({WAV_N})) AS i
        FROM documents WHERE doc_id % 2 <> 0)
),
q AS MATERIALIZED (
  SELECT doc_id, i, (abs(v) < {SILENCE_THRESHOLD}) AS quiet FROM s
),
runs AS (
  SELECT doc_id, i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM q WHERE quiet
),
runlen AS (
  SELECT doc_id, grp, CAST(COUNT(*) AS INT) AS rl FROM runs GROUP BY doc_id, grp
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS INT) AS n_samples,
         CAST(SUM(CASE WHEN quiet THEN 1 ELSE 0 END) AS INT) AS n_quiet
  FROM q GROUP BY doc_id
)
SELECT a.doc_id, a.n_samples, a.n_quiet,
       COALESCE(m.mx, 0) AS longest_quiet_run,
       {SQL_ROUND6.format(x="CAST(a.n_quiet AS DOUBLE) / a.n_samples")} AS quiet_frac
FROM agg a
LEFT JOIN (SELECT doc_id, CAST(MAX(rl) AS INT) AS mx
           FROM runlen GROUP BY doc_id) m USING (doc_id)
"""

ORACLES["multimodal_scene_cut"] = f"""
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(ceil(length(text) / {FRAME_CHARS}.0) AS BIGINT),
                      {FRAME_STRIDE})) AS frame_idx
  FROM documents WHERE text IS NOT NULL
    AND length(text) > 0
),
e AS (
  SELECT doc_id, frame_idx,
         list_sum(list_transform(
             range(length(substr(text, frame_idx * {FRAME_CHARS} + 1, {FRAME_CHARS}))),
             i -> unicode(substr(substr(text, frame_idx * {FRAME_CHARS} + 1, {FRAME_CHARS}), i + 1, 1))
         )) * 1000 // length(substr(text, frame_idx * {FRAME_CHARS} + 1, {FRAME_CHARS}))
           AS e_milli
  FROM f
),
d AS (
  SELECT doc_id, frame_idx,
         abs(e_milli - lag(e_milli) OVER (PARTITION BY doc_id ORDER BY frame_idx))
           AS delta_milli
  FROM e
)
SELECT doc_id,
       COUNT(*) AS n_frames,
       CAST(COALESCE(SUM(CASE WHEN delta_milli > {SCENE_TAU_MILLI}
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cuts,
       CAST(MAX(delta_milli) AS BIGINT) AS max_delta_milli
FROM d
GROUP BY doc_id
"""

_SEG_EXPR = f"substr(text, win_start + 1, {AUDIO_WINDOW})"

ORACLES["multimodal_audio_window"] = f"""
WITH w AS (
  SELECT doc_id, text,
         unnest(range(0, length(text), {AUDIO_HOP})) AS win_start
  FROM documents WHERE text IS NOT NULL
),
seg AS (
  SELECT doc_id, win_start, {_SEG_EXPR} AS seg,
         list_transform(range(length({_SEG_EXPR})),
                        i -> unicode(substr({_SEG_EXPR}, i + 1, 1))) AS codes
  FROM w
)
SELECT doc_id,
       CAST(win_start AS INT) AS win_start,
       CAST(length(seg) AS INT) AS win_len,
       CAST(COALESCE(list_sum(list_transform(codes, c -> CAST(c AS BIGINT) * c)), 0)
            AS BIGINT) AS energy,
       CAST(COALESCE(list_max(codes), 0) AS INT) AS peak
FROM seg
"""

ORACLES["multimodal_audio_fingerprint"] = (
    ORACLES["multimodal_audio_window"].split("SELECT doc_id,\n")[0]
    + """, en AS (
  SELECT doc_id, win_start,
         CAST(COALESCE(list_sum(list_transform(codes, c -> CAST(c AS BIGINT) * c)), 0)
              AS BIGINT) AS energy
  FROM seg
),
earr AS (
  SELECT doc_id, list(energy ORDER BY win_start) AS e FROM en GROUP BY doc_id
),
fp AS (
  SELECT doc_id,
         CAST(COALESCE(list_sum(list_transform(
           range(least(greatest(len(e) - 1, 0), """
    + str(AFP_BITS)
    + """)),
           i -> CASE WHEN e[i + 1] < e[i + 2]
                     THEN CAST(1 AS BIGINT) << i ELSE 0 END)), 0)
              AS BIGINT) AS afp
  FROM earr
)
SELECT afp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM fp GROUP BY afp
"""
)

ORACLES["multimodal_resize"] = f"""
WITH g AS (
  SELECT doc_id, text, length(text) // {RESIZE_SRC_W} AS h
  FROM documents WHERE text IS NOT NULL
    AND length(text) // {RESIZE_SRC_W} >= 1
),
px AS (
  SELECT doc_id, CAST(h AS INT) AS src_h,
         list_transform(range({RESIZE_OUT * RESIZE_OUT}),
           k -> CAST(unicode(substr(text,
                  CAST(((k // {RESIZE_OUT}) * h) // {RESIZE_OUT}
                       * {RESIZE_SRC_W}
                       + ((k % {RESIZE_OUT}) * {RESIZE_SRC_W})
                         // {RESIZE_OUT} AS INT) + 1, 1)) AS INT)) AS pixels
  FROM g
)
SELECT doc_id, src_h,
       array_to_string(pixels, ',') AS pixels_csv,
       CAST(list_sum(pixels) AS BIGINT) AS checksum
FROM px
"""


ORACLES["multimodal_dhash"] = (
    ORACLES["multimodal_resize"].split("SELECT doc_id, src_h,")[0]
    + """, b AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(12),
           j -> CASE WHEN pixels[(j // 3) * """
    + str(RESIZE_OUT)
    + """ + (j % 3) + 1]
                     < pixels[(j // 3) * """
    + str(RESIZE_OUT)
    + """ + (j % 3) + 2]
                THEN CAST(1 AS BIGINT) << j ELSE 0 END)) AS BIGINT) AS dhash
  FROM px
)
SELECT dhash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM b GROUP BY dhash
"""
)

# near-dup report oracle: the same dhash CTE, then the DEFINITIONAL
# brute-force all-pairs popcount filter — deliberately not the banded
# join, so the gate certifies the pigeonhole banding argument
ORACLES["multimodal_near_dup_report"] = (
    ORACLES["multimodal_dhash"].split("SELECT dhash, MIN(doc_id)")[0]
    + f""",
pairs AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         bit_count(xor(x.dhash, y.dhash)) AS ham
  FROM b x JOIN b y ON x.doc_id <> y.doc_id
  WHERE bit_count(xor(x.dhash, y.dhash)) <= {NEARDUP_MAX_HAMMING}
),
near AS (
  SELECT doc_a, CAST(COUNT(*) AS BIGINT) AS n_near,
         MIN(struct_pack(ham := ham, d := doc_b)) AS best
  FROM pairs GROUP BY doc_a
)
SELECT h.doc_id, h.dhash,
       CAST(COALESCE(n.n_near, 0) AS BIGINT) AS n_near,
       CAST(n.best.ham AS INT) AS min_hamming,
       CAST(n.best.d AS BIGINT) AS nearest_doc
FROM b h LEFT JOIN near n ON n.doc_a = h.doc_id
"""
)

# multimodal_decode_real: the oracle replays the PLANTED GENERATOR
# arithmetic (pixel[i] = (doc_id·31 + i·7) mod 256; sample[i] =
# ((doc_id·13 + i·5) mod 65536) − 32768) and never touches the bytes —
# the Spark side must synthesize real PPM/WAV files and parse them back
# (header walk, endianness, chunk alignment) to land on the same sums.
ORACLES["multimodal_decode_real"] = f"""
WITH ppm AS (
  -- pmod forms + <>0 parity: the synth runs in PYTHON (% is pmod-like);
  -- DuckDB's sign-preserving % diverged on negative doc_ids (fuzz 101001)
  SELECT doc_id,
         list_transform(range({PPM_W * PPM_H * 3}),
                        i -> ((doc_id * 31 + i * 7) % 256 + 256) % 256)
           AS vals
  FROM documents WHERE doc_id % 2 = 0
),
wav AS (
  SELECT doc_id,
         list_transform(range({WAV_N}),
                        i -> (((doc_id * 13 + i * 5) % 65536) + 65536)
                             % 65536 - 32768) AS vals
  FROM documents WHERE doc_id % 2 <> 0
)
SELECT doc_id, 'ppm' AS fmt,
       CAST({PPM_W} AS INT) AS width, CAST({PPM_H} AS INT) AS height,
       CAST({PPM_W * PPM_H * 3} AS INT) AS n_samples,
       CAST(NULL AS INT) AS sample_rate,
       CAST(list_sum(vals) AS BIGINT) AS value_sum,
       CAST(list_max(vals) AS INT) AS value_peak
FROM ppm
UNION ALL
SELECT doc_id, 'wav' AS fmt,
       CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
       CAST({WAV_N} AS INT) AS n_samples,
       CAST({WAV_RATE} AS INT) AS sample_rate,
       CAST(list_sum(vals) AS BIGINT) AS value_sum,
       CAST(list_max(list_transform(vals, v -> abs(v))) AS INT) AS value_peak
FROM wav
"""
