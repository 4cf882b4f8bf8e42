"""SRT subtitle ingestion — the speech-text alignment gate.

Speech corpora pair audio with subtitle files; the cue table (start/end
milliseconds + text) is what an ASR-pretraining pipeline joins against
frame-sampled audio. SRT is a plain-text format with real-world quirks —
optional UTF-8 BOM, CRLF vs LF, multi-line cue text — all handled here
with strict timestamp validation (a silently mis-parsed timestamp
misaligns every downstream segment, so malformed cues raise).

Reference scope note: the reference app (hellohappyworld/
flink-gmall2024-realtime) has no subtitle path; this is part of the
beyond-reference LLM-data-pipeline surface the build brief asks for.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .codecguard import malformed_guard

_TS_RE = re.compile(
    r"^(\d{2}):(\d{2}):(\d{2}),(\d{3}) --> (\d{2}):(\d{2}):(\d{2}),(\d{3})\s*$"
)


def synth_srt(seed: int) -> bytes:
    """Deterministic SRT fixture: ``seed%8+2`` cues; cue k starts at
    start_ms = k*1000*(seed%5+1) + seed%997 and lasts (seed+7k)%2000+500
    ms, with m = (seed+2k)%12+2 fixed-width words ((seed+k)%3==0 cues
    split the words over two text lines). CRLF line endings when seed is
    odd, a UTF-8 BOM when seed%6==0."""
    seed = int(seed)
    n = seed % 8 + 2
    nl = "\r\n" if seed % 2 else "\n"

    def ts(ms: int) -> str:
        h, rem = divmod(ms, 3_600_000)
        mi, rem = divmod(rem, 60_000)
        s, ms2 = divmod(rem, 1000)
        return f"{h:02d}:{mi:02d}:{s:02d},{ms2:03d}"

    blocks = []
    for k in range(n):
        start = k * 1000 * (seed % 5 + 1) + seed % 997
        end = start + (seed + 7 * k) % 2000 + 500
        m = (seed + 2 * k) % 12 + 2
        words = [f"w{i:03d}" for i in range(m)]
        if (seed + k) % 3 == 0:
            half = m // 2
            text = " ".join(words[:half]) + nl + " ".join(words[half:])
        else:
            text = " ".join(words)
        blocks.append(f"{k + 1}{nl}{ts(start)} --> {ts(end)}{nl}{text}{nl}")
    body = nl.join(blocks)
    out = body.encode("utf-8")
    if seed % 6 == 0:
        out = b"\xef\xbb\xbf" + out
    return out


@malformed_guard
def parse_srt(payload: bytes) -> list:
    """REAL SRT cue walk: BOM strip, CRLF/LF normalization, blank-line
    cue splitting, strict ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` timestamp
    parse, multi-line text joined with single spaces. Returns one
    (cue_idx, start_ms, end_ms, n_tokens) per cue; malformed cue headers
    or timestamps raise ValueError."""
    text = payload.decode("utf-8")
    if text.startswith("﻿"):
        text = text[1:]
    text = text.replace("\r\n", "\n")
    rows = []
    for block in re.split(r"\n\s*\n", text.strip()):
        lines = block.strip().split("\n")
        if len(lines) < 2:
            raise ValueError(f"cue block too short: {block[:40]!r}")
        if not lines[0].strip().isdigit():
            raise ValueError(f"cue index is not a number: {lines[0]!r}")
        m = _TS_RE.match(lines[1])
        if not m:
            raise ValueError(f"malformed timestamp line: {lines[1]!r}")
        g = [int(x) for x in m.groups()]
        start = ((g[0] * 60 + g[1]) * 60 + g[2]) * 1000 + g[3]
        end = ((g[4] * 60 + g[5]) * 60 + g[6]) * 1000 + g[7]
        if end < start:
            raise ValueError(f"cue ends before it starts: {lines[1]!r}")
        cue_text = " ".join(ln.strip() for ln in lines[2:])
        rows.append(
            (int(lines[0]) - 1, start, end, len(cue_text.split()))
        )
    return rows


SRT_CUES_SCHEMA = (
    "media_id long, cue_idx int, start_ms long, end_ms long, n_tokens int"
)


def srt_cues(media: DataFrame) -> DataFrame:
    """Per-cue table from SRT payloads via ``mapInPandas`` — the segment
    table an audio-text aligner range-joins against audio frames.
    Per-row Arrow work, linear by construction."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for row in parse_srt(bytes(p)):
                    out.append((mid, *row))
            yield pd.DataFrame(
                out,
                columns=["media_id", "cue_idx", "start_ms", "end_ms", "n_tokens"],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=SRT_CUES_SCHEMA
    )
