"""Deterministic synthetic multi-turn transcript generator.

Produces the authoritative input shape (BASELINE.json input_hint):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp (+ ds:string partition column)

Generation mirrors the reference's randomized test-data conventions
(spark/src/test/.../utils/DataFrameGen.scala:31-130): seeded, null
injection (~5% text, ~60% tool), zipf-skewed conversation lengths (hot
keys for skew-splitting tests), mixed-scale time gaps (seconds..hours so
gap sessionization has real sessions), and deliberate exact-duplicate
timestamps to pin the inclusive-head window boundary
(SawtoothAggregatorTest.scala:177-216).

Everything is vectorized numpy off a single default_rng(seed) — same seed,
same table, at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BASE_TS_MS = 1767225600000  # 2026-01-01T00:00:00Z
ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "code", "browser"])
VOCAB = np.array(
    "the of and to in is for on with as at by from turn model data query spark "
    "window join key value table scan agg text tool chat plan step result code".split()
)


def generate_transcripts(
    n_convs: int = 50,
    avg_turns: int = 40,
    n_days: int = 14,
    seed: int = 42,
    null_text_frac: float = 0.05,
    null_tool_frac: float = 0.60,
    tie_frac: float = 0.03,
    hot_conv_factor: int = 0,
) -> pd.DataFrame:
    """hot_conv_factor > 0 makes conversation 0 ~factor× the average length
    (hot-key skew)."""
    rng = np.random.default_rng(seed)
    turns = 1 + rng.poisson(avg_turns - 1, size=n_convs)
    if hot_conv_factor > 0:
        turns[0] = avg_turns * hot_conv_factor
    total = int(turns.sum())
    conv_ids = np.repeat([f"conv_{i:06d}" for i in range(n_convs)], turns)
    turn_idx = np.concatenate([np.arange(t, dtype=np.int32) for t in turns])

    # conversation start times spread over the first (n_days - 1) days
    span_ms = max(1, (n_days - 1)) * 86_400_000
    starts = BASE_TS_MS + rng.integers(0, span_ms, size=n_convs)
    # gap mixture: 40% seconds (1-30s), 40% minutes (1-10m), 17% hours (1-4h), 3% exact tie
    kind = rng.random(total)
    gaps = np.where(
        kind < tie_frac,
        0,
        np.where(
            kind < tie_frac + 0.40,
            rng.integers(1_000, 30_000, size=total),
            np.where(
                kind < tie_frac + 0.80,
                rng.integers(60_000, 600_000, size=total),
                rng.integers(3_600_000, 4 * 3_600_000, size=total),
            ),
        ),
    )
    first_of_conv = turn_idx == 0
    gaps = np.where(first_of_conv, 0, gaps)
    boundaries = np.flatnonzero(first_of_conv)
    cum = np.cumsum(gaps)
    # reset the cumulative gap at each conversation start
    offsets = cum - np.repeat(cum[boundaries], turns)
    ts_ms = np.repeat(starts, turns) + offsets

    role = np.where(
        turn_idx % 2 == 0, "user", np.where(rng.random(total) < 0.9, "assistant", ROLES[2 + (rng.integers(0, 2, size=total))])
    )
    n_words = rng.integers(1, 20, size=total)
    word_ids = rng.integers(0, len(VOCAB), size=(total, 20))
    texts = np.array([" ".join(VOCAB[word_ids[i, : n_words[i]]]) for i in range(total)], dtype=object)
    texts[rng.random(total) < null_text_frac] = None
    tool = TOOLS[rng.integers(0, len(TOOLS), size=total)].astype(object)
    tool[rng.random(total) < null_tool_frac] = None

    # microsecond resolution: Spark cannot read parquet TIMESTAMP(NANOS)
    ts = pd.to_datetime(ts_ms, unit="ms", utc=True).tz_convert(None).astype("datetime64[us]")
    return pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": ts,
            "ds": ts.strftime("%Y-%m-%d"),
        }
    )
