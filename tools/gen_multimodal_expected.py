"""Materialize expected outputs for the deterministic multimodal
queries (VERDICT r3 #3): every `multimodal_*` query is a pure function
of `doc_id` (the fixture media is synthesized from the id, and the
codecs are deterministic), so the expected per-doc rows can be
precomputed ONCE through the pixel-tested codec path and stored as
parquet; the DuckDB oracle then joins them against the sf's documents
table -- turning 7 rows-only queries into hash-checked ones, the same
move that converted streaming_session_windows.

What this verifies: that the distributed plumbing (mapInPandas
signatures, Arrow batching, explode fan-out, schema) delivers exactly
the per-row pure function at any partitioning.  The codecs themselves
are verified separately by pixel-level unit tests
(tests/test_multimodal.py, tests/test_jpeg.py); this is deliberately
the SAME code -- the oracle isolates the Spark layer, not numpy.

Output: fixtures/expected_multimodal/*.parquet for doc_ids 0..4999
(covers sf0.001 / 0.01 / 0.1 documents tables; the join keeps only the
ids present at the oracle's sf).

Usage: python tools/gen_multimodal_expected.py [max_doc_id)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_co2_emission_analysis_spark.operators.jpeg import encode_jpeg  # noqa: E402
from big_data_co2_emission_analysis_spark.operators.multimodal import (  # noqa: E402
    audio_features,
    stable_norm,
    bmp_features,
    decode_bmp,
    decode_image_batch,
    decode_wav,
    decode_y4m,
    encode_bmp,
    encode_png,
    resize_nearest,
    synth_bmp,
    synth_wav,
    synth_y4m,
)

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "expected_multimodal",
)


def write(name: str, df: pd.DataFrame, schema: pa.Schema) -> None:
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, os.path.join(OUT_DIR, f"{name}.parquet"))
    print(f"{name}: {len(df)} rows")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    os.makedirs(OUT_DIR, exist_ok=True)
    ids = list(range(n))

    # --- image payloads (attach_media_columns: w=16+id%8, h=12+id%5) ---
    payloads = {i: synth_bmp(i, 16 + i % 8, 12 + i % 5) for i in ids}

    # multimodal_features: (doc_id, feat_norm, feat_dim)
    rows = []
    for i in ids:
        f = bmp_features(decode_bmp(payloads[i]))
        rows.append((i, stable_norm(f), len(f)))
    write(
        "features",
        pd.DataFrame(rows, columns=["doc_id", "feat_norm", "feat_dim"]),
        pa.schema([("doc_id", pa.int64()), ("feat_norm", pa.float64()), ("feat_dim", pa.int32())]),
    )

    # multimodal_resize: (doc_id, payload_bytes, width, height) @16x16
    rows = []
    for i in ids:
        b = encode_bmp(resize_nearest(decode_bmp(payloads[i]), 16, 16))
        rows.append((i, len(b), 16, 16))
    write(
        "resize",
        pd.DataFrame(rows, columns=["doc_id", "payload_bytes", "width", "height"]),
        pa.schema([("doc_id", pa.int64()), ("payload_bytes", pa.int64()), ("width", pa.int32()), ("height", pa.int32())]),
    )

    # multimodal_frame_samples: substring slicing, n_frames=4.
    # Mirrors the Spark expression exactly: start = int(i*L/4.0) (int
    # division-as-double then truncate), length = int(L/4.0), both
    # clamped by the payload end; docs with L < 4 are filtered out.
    rows = []
    for i in ids:
        L = len(payloads[i])
        if L < 4:
            continue
        flen = int(L / 4.0)
        for fi in range(4):
            start = int(fi * L / 4.0)
            rows.append((i, fi, len(payloads[i][start : start + flen])))
    write(
        "frame_samples",
        pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_len"]),
        pa.schema([("doc_id", pa.int64()), ("frame_idx", pa.int32()), ("frame_len", pa.int64())]),
    )

    # multimodal_metadata_stats input: per-doc typed metadata
    rows = [(i, "image", "bmp", len(payloads[i]), 16 + i % 8) for i in ids]
    write(
        "media_meta",
        pd.DataFrame(rows, columns=["doc_id", "media_type", "format", "size_bytes", "width"]),
        pa.schema([("doc_id", pa.int64()), ("media_type", pa.string()), ("format", pa.string()), ("size_bytes", pa.int64()), ("width", pa.int32())]),
    )

    # multimodal_video_frames: y4m(6+id%4 frames), every 2nd frame
    rows = []
    for i in ids:
        frames, _fps = decode_y4m(synth_y4m(i, 6 + i % 4))
        for idx in range(0, len(frames), 2):
            f = frames[idx]
            rows.append((i, idx, len(encode_bmp(f)), f.shape[1], f.shape[0]))
    write(
        "video_frames",
        pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes", "width", "height"]),
        pa.schema([("doc_id", pa.int64()), ("frame_idx", pa.int32()), ("frame_bytes", pa.int64()), ("width", pa.int32()), ("height", pa.int32())]),
    )

    # multimodal_audio_features: wav(1200 + (id%5)*200 samples)
    rows = []
    for i in ids:
        samples, sr = decode_wav(synth_wav(i, 1200 + (i % 5) * 200))
        feats = audio_features(samples, sr)
        rows.append(
            (i, feats["duration_ms"], feats["rms"], feats["zero_crossing_rate"], feats["peak"], feats["sample_rate"])
        )
    write(
        "audio_features",
        pd.DataFrame(rows, columns=["doc_id", "duration_ms", "rms", "zero_crossing_rate", "peak", "sample_rate"]),
        pa.schema([
            ("doc_id", pa.int64()), ("duration_ms", pa.int32()), ("rms", pa.float64()),
            ("zero_crossing_rate", pa.float64()), ("peak", pa.float64()), ("sample_rate", pa.int32()),
        ]),
    )

    # multimodal_mixed_format_features: per-doc (format, feat_norm);
    # the oracle aggregates. Formats cycle bmp/png/jpeg by doc_id%3.
    rows = []
    for i in ids:
        px = decode_bmp(payloads[i])
        if i % 3 == 0:
            p, fmt = payloads[i], "bmp"
        elif i % 3 == 1:
            p, fmt = encode_png(px), "png"
        else:
            p, fmt = encode_jpeg(px, quality=90), "jpeg"
        f = decode_image_batch([p])[0]
        rows.append((i, fmt, stable_norm(f)))
    write(
        "mixed_formats",
        pd.DataFrame(rows, columns=["doc_id", "format", "feat_norm"]),
        pa.schema([("doc_id", pa.int64()), ("format", pa.string()), ("feat_norm", pa.float64())]),
    )

    print("done:", OUT_DIR)


if __name__ == "__main__":
    main()
