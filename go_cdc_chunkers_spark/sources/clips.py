"""Synthetic `clips` table builder + loaders (FIXTURES.md F1).

Schema (BASELINE.json input_hint):
  clips(clip_id string, bytes binary, sr_hz int, dur_ms int,
        codec string, transcript string)

Deterministic (seeded numpy PCG64; no wall clock). Base clips are
sine+noise PCM s16le; duplicates are derived three ways:
  - exact: bytes + transcript copied verbatim;
  - near:  seeded random insertions -- the edit model of the reference's
           resync tool (cmd/cdc/resync.go:134-147), applied at sample
           granularity -- plus amplitude jitter kept below the SNR >= 30 dB
           per-row invariant (BASELINE.json input_hint), and <= 2 token
           edits on the transcript;
  - const: pathological constant-PCM clips (all zero / all 0xAA) for the
           LSH-skew fixture (FIXTURES.md F5).

Ground-truth duplicate groups are emitted alongside as
  clips_truth(clip_id string, group_id long)
so the recall >= 0.99 gate can enumerate all intra-group pairs.

Writes plain Parquet in an Iceberg-compatible layout (hash-bucket directory
partitioning is left to the writer); the Iceberg catalog itself needs jars
not present in this image, so the table format is gated behind import-try in
sources/iceberg.py.
"""

from __future__ import annotations

import numpy as np

WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu zero one two three four five six seven eight "
    "nine stream chunk audio clip hash table spark shuffle band cluster "
    "signal noise sample frame codec window mask cut jump gear anchor "
    "parquet batch arrow vector salt skew label merge probe scan"
).split()


def _sine_noise_pcm(rng: np.ndarray, n_samples: int, freq: float, sr: int,
                    noise_amp: float) -> np.ndarray:
    t = np.arange(n_samples, dtype=np.float64) / sr
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    x += noise_amp * rng.standard_normal(n_samples)
    return np.clip(x * 32767.0, -32768, 32767).astype("<i2")


def _insert_samples(rng, pcm: np.ndarray, n_edits: int) -> np.ndarray:
    """Seeded random insertions (resync.go:134-147 edit model, per sample)."""
    out = pcm
    for _ in range(n_edits):
        pos = int(rng.integers(0, len(out) + 1))
        val = np.array([rng.integers(-32768, 32767)], dtype="<i2")
        out = np.concatenate([out[:pos], val, out[pos:]])
    return out


def edit_pcm_bytes(raw: bytes, n_edits: int, seed: int) -> bytes:
    """Apply exactly `n_edits` seeded random sample insertions to a
    pcm_s16le byte string (the resync.go:134-147 edit model). Deterministic
    in (raw, n_edits, seed); used by the edit-robustness sweep
    (entry_queries.cdc_resync_sweep) to grade shared-bytes decay vs edit
    count."""
    rng = np.random.default_rng(seed)
    n = len(raw) - (len(raw) % 2)
    pcm = np.frombuffer(raw[:n], dtype="<i2")
    return _insert_samples(rng, pcm, n_edits).tobytes()


def _jitter(rng, pcm: np.ndarray) -> np.ndarray:
    """Amplitude jitter below the SNR >= 30 dB invariant: y = x*(1+e),
    |e| <= 0.03 => noise power <= 1e-3 x signal power (SNR ~ 30.5 dB)."""
    e = float(rng.uniform(-0.03, 0.03))
    return np.clip(pcm.astype(np.float64) * (1.0 + e), -32768, 32767).astype("<i2")


def _edit_transcript(rng, words: list[str]) -> list[str]:
    out = list(words)
    for _ in range(int(rng.integers(0, 3))):  # <= 2 token edits
        if not out:
            break
        i = int(rng.integers(0, len(out)))
        op = int(rng.integers(0, 3))
        w = WORDS[int(rng.integers(0, len(WORDS)))]
        if op == 0:
            out[i] = w
        elif op == 1:
            out.insert(i, w)
        else:
            del out[i]
    return out


def generate_clips(
    n_base: int = 120,
    dup_frac: float = 0.25,
    near_frac: float = 0.25,
    n_const: int = 4,
    seed: int = 42,
    sr: int = 16000,
    min_ms: int = 150,
    max_ms: int = 1200,
    n_edits: int = 16,
):
    """Return (rows, truth) where rows is a list of clip dicts and truth maps
    clip_id -> duplicate group id. Group ids are the base clip's index; clips
    without any duplicate still carry their own group (singleton)."""
    rng = np.random.default_rng(seed)
    rows = []
    truth = {}
    base_pcm = []
    base_words = []
    for i in range(n_base):
        dur_ms = int(rng.integers(min_ms, max_ms))
        n_samples = sr * dur_ms // 1000
        freq = float(rng.uniform(80, 3000))
        pcm = _sine_noise_pcm(rng, n_samples, freq, sr, noise_amp=0.05)
        words = [WORDS[int(rng.integers(0, len(WORDS)))]
                 for _ in range(int(rng.integers(5, 20)))]
        base_pcm.append(pcm)
        base_words.append(words)
        clip_id = f"clip-{i:08d}"
        rows.append(dict(
            clip_id=clip_id, bytes=pcm.tobytes(), sr_hz=sr,
            dur_ms=dur_ms, codec="pcm_s16le", transcript=" ".join(words),
        ))
        truth[clip_id] = i

    next_id = n_base
    n_dup = int(n_base * dup_frac)
    n_near = int(n_base * near_frac)
    for k in range(n_dup):
        src = int(rng.integers(0, n_base))
        clip_id = f"clip-{next_id:08d}"
        next_id += 1
        pcm = base_pcm[src]
        rows.append(dict(
            clip_id=clip_id, bytes=pcm.tobytes(), sr_hz=sr,
            dur_ms=len(pcm) * 1000 // sr, codec="pcm_s16le",
            transcript=" ".join(base_words[src]),
        ))
        truth[clip_id] = src
    for k in range(n_near):
        src = int(rng.integers(0, n_base))
        clip_id = f"clip-{next_id:08d}"
        next_id += 1
        # Half the near-dups are insertion-only (recoverable via PCM chunk
        # MinHash, the CDC resync property); half add amplitude jitter that
        # perturbs every byte (recoverable only via the transcript path --
        # exactly why the north star pairs SimHash with chunk MinHash).
        pcm = _insert_samples(rng, base_pcm[src], n_edits)
        if k % 2 == 1:
            pcm = _jitter(rng, pcm)
        words = _edit_transcript(rng, base_words[src])
        rows.append(dict(
            clip_id=clip_id, bytes=pcm.tobytes(), sr_hz=sr,
            dur_ms=len(pcm) * 1000 // sr, codec="pcm_s16le",
            transcript=" ".join(words),
        ))
        truth[clip_id] = src
    for k in range(n_const):
        clip_id = f"clip-{next_id:08d}"
        next_id += 1
        fill = 0 if k % 2 == 0 else 0xAA
        n_samples = sr // 2
        raw = np.full(2 * n_samples, fill, dtype=np.uint8)
        rows.append(dict(
            clip_id=clip_id, bytes=raw.tobytes(), sr_hz=sr,
            dur_ms=500, codec="pcm_s16le",
            transcript=("digital silence flat padding" if fill == 0
                        else "alternating bitpattern carrier hum"),
        ))
        truth[clip_id] = n_base + (k % 2)  # two constant groups
    return rows, truth


def _base_clip(seed: int, i: int, sr: int, min_ms: int, max_ms: int):
    """Base clip i as a pure function of (seed, i): own PCG64 stream, same
    draw order as generate_clips' base loop. Returns (pcm, words, dur_ms)."""
    rng = np.random.default_rng([seed, 0, i])
    dur_ms = int(rng.integers(min_ms, max_ms))
    n_samples = sr * dur_ms // 1000
    freq = float(rng.uniform(80, 3000))
    pcm = _sine_noise_pcm(rng, n_samples, freq, sr, noise_amp=0.05)
    words = [WORDS[int(rng.integers(0, len(WORDS)))]
             for _ in range(int(rng.integers(5, 20)))]
    return pcm, words, dur_ms


def generate_clips_df(
    spark,
    n_base: int = 120,
    dup_frac: float = 0.25,
    near_frac: float = 0.25,
    n_const: int = 4,
    seed: int = 42,
    sr: int = 16000,
    min_ms: int = 150,
    max_ms: int = 1200,
    n_edits: int = 16,
    mixed_codecs: bool = False,
    num_partitions: int | None = None,
):
    """Executor-side twin of generate_clips: the deployment-shaped corpus.

    generate_clips builds the whole corpus as one driver-side Python list
    off a single sequential RNG stream -- fine for tests, fatal for the
    spark-submit face (at n_base=12000 that is a ~400 MB list funneled
    through createDataFrame into a default-1g driver heap; measured as a
    GC-thrash stall, core-count independent). Here every clip is a pure
    function of (seed, role, index) via its own PCG64 stream
    (default_rng([seed, role, k])), so generation runs INSIDE mapInPandas
    over spark.range: nothing crosses the driver, partitioning cannot
    change the data, and a 10^12-row range would distribute the same way.
    Same schema, duplicate-group structure, and edit model (resync.go:
    134-147 insertions; SNR >= 30 dB jitter) as generate_clips; the bytes
    differ (per-clip streams, not the sequential stream) by design.

    Returns (clips_df, truth_df) where truth_df(clip_id, group_id) is
    computed by the same index arithmetic with a second cheap pass (no PCM
    synthesis)."""
    n_dup = int(n_base * dup_frac)
    n_near = int(n_base * near_frac)
    n_total = n_base + n_dup + n_near + n_const
    p = dict(n_base=n_base, n_dup=n_dup, n_near=n_near, seed=seed, sr=sr,
             min_ms=min_ms, max_ms=max_ms, n_edits=n_edits,
             mixed=mixed_codecs)

    def _role(i: int):
        if i < p["n_base"]:
            return "base", i
        if i < p["n_base"] + p["n_dup"]:
            return "dup", i - p["n_base"]
        if i < p["n_base"] + p["n_dup"] + p["n_near"]:
            return "near", i - p["n_base"] - p["n_dup"]
        return "const", i - p["n_base"] - p["n_dup"] - p["n_near"]

    def _src(kind: str, k: int) -> int:
        role = 1 if kind == "dup" else 2
        return int(np.random.default_rng(
            [p["seed"], role, k]).integers(0, p["n_base"]))

    def _group(i: int) -> int:
        kind, k = _role(i)
        if kind == "base":
            return i
        if kind == "const":
            return p["n_base"] + (k % 2)
        return _src(kind, k)

    def _make_row(i: int) -> dict:
        kind, k = _role(i)
        clip_id = f"clip-{i:08d}"
        if kind == "base":
            pcm, words, dur_ms = _base_clip(
                p["seed"], i, p["sr"], p["min_ms"], p["max_ms"])
        elif kind == "dup":
            pcm, words, _ = _base_clip(
                p["seed"], _src(kind, k), p["sr"], p["min_ms"], p["max_ms"])
            dur_ms = len(pcm) * 1000 // p["sr"]
        elif kind == "near":
            base_pcm, base_words, _ = _base_clip(
                p["seed"], _src(kind, k), p["sr"], p["min_ms"], p["max_ms"])
            rng = np.random.default_rng([p["seed"], 3, k])
            pcm = _insert_samples(rng, base_pcm, p["n_edits"])
            if k % 2 == 1:
                pcm = _jitter(rng, pcm)
            words = _edit_transcript(rng, base_words)
            dur_ms = len(pcm) * 1000 // p["sr"]
        else:  # const
            fill = 0 if k % 2 == 0 else 0xAA
            raw = np.full(p["sr"], fill, dtype=np.uint8)
            return dict(clip_id=clip_id, bytes=raw.tobytes(),
                        sr_hz=p["sr"], dur_ms=500, codec="pcm_s16le",
                        transcript=("digital silence flat padding"
                                    if fill == 0 else
                                    "alternating bitpattern carrier hum"))
        row = dict(clip_id=clip_id, bytes=pcm.tobytes(), sr_hz=p["sr"],
                   dur_ms=dur_ms, codec="pcm_s16le",
                   transcript=" ".join(words))
        if p["mixed"] and i % 3:
            pcm16 = np.frombuffer(row["bytes"], dtype="<i2")
            if i % 3 == 1:
                from go_cdc_chunkers_spark.operators.flac import flac_encode
                row["bytes"] = bytes(
                    flac_encode(pcm16.astype(np.int64), p["sr"]))
                row["codec"] = "flac"
            else:
                row["bytes"] = wav_wrap(pcm16, p["sr"])
                row["codec"] = "wav"
        return row

    def _gen(batches):
        import pandas as pd
        buf, buf_bytes = [], 0
        for pdf in batches:
            for i in pdf["id"].tolist():
                row = _make_row(int(i))
                buf.append(row)
                buf_bytes += len(row["bytes"])
                if len(buf) >= 256 or buf_bytes >= (32 << 20):
                    yield pd.DataFrame(buf)
                    buf, buf_bytes = [], 0
        if buf:
            yield pd.DataFrame(buf)

    def _truth(batches):
        import pandas as pd
        for pdf in batches:
            ids = [int(i) for i in pdf["id"].tolist()]
            yield pd.DataFrame({
                "clip_id": [f"clip-{i:08d}" for i in ids],
                "group_id": [_group(i) for i in ids],
            })

    rng_ids = spark.range(0, n_total, 1, num_partitions) if num_partitions \
        else spark.range(n_total)
    clips = rng_ids.mapInPandas(
        _gen, "clip_id string, bytes binary, sr_hz int, dur_ms int, "
              "codec string, transcript string")
    truth = rng_ids.mapInPandas(_truth, "clip_id string, group_id long")
    return clips, truth


def wav_wrap(pcm16: np.ndarray, sr: int) -> bytes:
    """Minimal RIFF/WAVE (fmt 1, mono s16le) container around raw PCM.
    Thin wrapper over the one general container writer (codecs.wav_wrap)
    so every header builder stays in sync with _decode_wav."""
    from ..operators.codecs import wav_wrap as _wav_wrap

    return _wav_wrap(pcm16.astype("<i2").tobytes(), tag=1, channels=1,
                     block_align=2, sample_rate=int(sr), bits=16)


def generate_chord_clips(
    n_base: int = 40,
    dup_frac: float = 0.2,
    jitter_frac: float = 0.2,
    insert_frac: float = 0.2,
    seed: int = 4242,
    sr: int = 16000,
    min_ms: int = 1000,
    max_ms: int = 3000,
    n_tones: int = 4,
    n_edits: int = 16,
):
    """Multi-tone ("chord") clips fixture for the spectral-fingerprint
    channel (operators/audio_fp.py): each base clip is a sum of `n_tones`
    random sines + low noise, so distinct bases share almost no spectral
    landmarks while every derived variant keeps its base's constellation.
    Three variant kinds, each tagged in the returned `kinds` dict:
      - exact: verbatim copy;
      - jitter: y = x*(1+e), |e| <= 0.03 -- perturbs EVERY byte (the
        CDC-chunk-MinHash-blind case audio_fp exists for);
      - insert: `n_edits` seeded sample insertions (the CDC-friendly case;
        spectral landmarks survive because hop >> n_edits samples).
    Returns (rows, truth, kinds): truth maps clip_id -> base index, kinds
    maps variant clip_id -> 'exact' | 'jitter' | 'insert'."""
    rng = np.random.default_rng(seed)
    rows, truth, kinds = [], {}, {}
    base_pcm = []
    for i in range(n_base):
        dur_ms = int(rng.integers(min_ms, max_ms))
        n_samples = sr * dur_ms // 1000
        t = np.arange(n_samples, dtype=np.float64) / sr
        x = np.zeros(n_samples)
        for _ in range(n_tones):
            freq = float(rng.uniform(100, 3500))
            x += (0.5 / n_tones) * np.sin(2 * np.pi * freq * t)
        x += 0.02 * rng.standard_normal(n_samples)
        pcm = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
        base_pcm.append(pcm)
        clip_id = f"chord-{i:08d}"
        rows.append(dict(
            clip_id=clip_id, bytes=pcm.tobytes(), sr_hz=sr, dur_ms=dur_ms,
            codec="pcm_s16le",
            transcript=" ".join(WORDS[int(rng.integers(0, len(WORDS)))]
                                for _ in range(8)),
        ))
        truth[clip_id] = i

    next_id = n_base
    for kind, frac in (("exact", dup_frac), ("jitter", jitter_frac),
                       ("insert", insert_frac)):
        for _ in range(int(n_base * frac)):
            src = int(rng.integers(0, n_base))
            pcm = base_pcm[src]
            if kind == "jitter":
                pcm = _jitter(rng, pcm)
            elif kind == "insert":
                pcm = _insert_samples(rng, pcm, n_edits)
            clip_id = f"chord-{next_id:08d}"
            next_id += 1
            rows.append(dict(
                clip_id=clip_id, bytes=pcm.tobytes(), sr_hz=sr,
                dur_ms=len(pcm) * 1000 // sr, codec="pcm_s16le",
                transcript=rows[src]["transcript"],
            ))
            truth[clip_id] = src
            kinds[clip_id] = kind
    return rows, truth, kinds


def write_clips_parquet(path: str, truth_path: str | None = None, **kw) -> int:
    """Materialize the synthetic table as parquet (pyarrow; no Spark needed).
    Returns the row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows, truth = generate_clips(**kw)
    table = pa.table({
        "clip_id": pa.array([r["clip_id"] for r in rows], pa.string()),
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "sr_hz": pa.array([r["sr_hz"] for r in rows], pa.int32()),
        "dur_ms": pa.array([r["dur_ms"] for r in rows], pa.int32()),
        "codec": pa.array([r["codec"] for r in rows], pa.string()),
        "transcript": pa.array([r["transcript"] for r in rows], pa.string()),
    })
    pq.write_table(table, path)
    if truth_path:
        t = pa.table({
            "clip_id": pa.array(list(truth), pa.string()),
            "group_id": pa.array([truth[k] for k in truth], pa.int64()),
        })
        pq.write_table(t, truth_path)
    return len(rows)


def decode_pcm(raw: bytes, codec: str = "pcm_s16le") -> np.ndarray:
    """P2 decode: pcm_s16le -> int16 samples. Other codecs are plumbing-only
    stubs (decoder libs are not in this image)."""
    if codec == "pcm_s16le":
        n = len(raw) - (len(raw) % 2)
        return np.frombuffer(raw[:n], dtype="<i2")
    raise NotImplementedError(f"codec {codec!r}: decode stubbed (no codec libs)")
