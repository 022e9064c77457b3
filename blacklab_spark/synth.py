"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Shape mandated by BASELINE.json input_hint:
    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp)

Zipfian vocabulary (head-term skew is real, so the salted/segmented
posting build is actually exercised), lognormal turn lengths, geometric
conversation lengths. Pure numpy, seeded — same (seed, n_turns) always
yields byte-identical rows. Generation is vectorized and, for Spark,
parallelized per conv-range partition via mapInArrow (no per-row
Python), so the bench corpus can be synthesized at scale without a
driver bottleneck.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

VOCAB_SIZE = 50_000
ZIPF_S = 1.07
MEAN_TURNS = 8
ROLES_TOOL_FRACTION = 0.10
_TOOLS = ["search", "browser", "python", "bash", "editor"]
_EPOCH_2025 = 1735689600  # 2025-01-01T00:00:00Z


def _vocab(vocab_size: int = VOCAB_SIZE) -> np.ndarray:
    """word0000 .. wordN — lowercase alnum so the [a-z0-9]+ tokenizer
    roundtrips exactly."""
    return np.array([f"word{i:05d}" for i in range(vocab_size)])


def _zipf_probs(vocab_size: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def generate_pandas(n_turns: int, seed: int = 42, start_conv: int = 0) -> pd.DataFrame:
    """Generate ``n_turns`` transcript turns deterministically.

    ``start_conv`` offsets conversation ids so distributed generation
    of disjoint slices stays deterministic and non-overlapping.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    probs = _zipf_probs(len(vocab))

    # conversation lengths: geometric, mean MEAN_TURNS, clipped [1, 64]
    est_convs = max(1, int(n_turns / MEAN_TURNS * 2) + 8)
    conv_lens = np.clip(rng.geometric(1.0 / MEAN_TURNS, est_convs), 1, 64)
    cum = np.cumsum(conv_lens)
    n_convs = int(np.searchsorted(cum, n_turns) + 1)
    conv_lens = conv_lens[:n_convs]
    conv_lens[-1] -= int(cum[n_convs - 1] - n_turns) if cum[n_convs - 1] > n_turns else 0

    conv_idx = np.repeat(np.arange(n_convs), conv_lens)[:n_turns]
    turn_idx = (
        np.arange(n_turns) - np.repeat(np.cumsum(np.append(0, conv_lens[:-1])), conv_lens)[:n_turns]
    )

    # turn lengths: lognormal mean ~40 tokens, clipped [1, 512]
    tlen = np.clip(rng.lognormal(3.4, 0.6, n_turns).astype(np.int64), 1, 512)
    total_tokens = int(tlen.sum())
    token_ids = rng.choice(len(vocab), total_tokens, p=probs)
    words = vocab[token_ids]
    bounds = np.cumsum(tlen)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(words, bounds)]

    role = np.where(turn_idx % 2 == 0, "user", "assistant")
    is_tool = rng.random(n_turns) < ROLES_TOOL_FRACTION
    role = np.where(is_tool, "tool", role)
    tool = np.where(is_tool, np.array(_TOOLS)[rng.integers(0, len(_TOOLS), n_turns)], "")

    ts = pd.to_datetime(
        _EPOCH_2025 + conv_idx * 3600 + turn_idx * 30, unit="s", utc=True
    ).tz_localize(None)

    return pd.DataFrame(
        {
            # 12-digit zero-pad: lexicographic order == numeric order
            # even for distributed generation's offset conv ranges
            # (pid * 10M reaches 10 digits), so a sorted/partitioned
            # write yields range-disjoint partitions and the dense-id
            # assignment takes its zero-shuffle fast path
            "conv_id": [f"conv{start_conv + c:012d}" for c in conv_idx],
            "turn_idx": turn_idx.astype(np.int32),
            "role": role,
            "text": texts,
            "tool": tool,
            "ts": ts,
        }
    )


def generate_spark(spark, n_turns: int, seed: int = 42, n_partitions: int = 32):
    """Distributed deterministic generation: each partition generates a
    disjoint slice with a derived seed — no driver-side materialization."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("turn_idx", IntegerType()),
            StructField("role", StringType()),
            StructField("text", StringType()),
            StructField("tool", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    per_part = -(-n_turns // n_partitions)
    # one slice id per partition IN ID ORDER (spark.range slices
    # evenly) — a hash repartition here would pack multiple disjoint
    # conv slices into one output file, making file key-ranges overlap
    # and forcing every downstream dense-id assignment through the
    # range-shuffle path. Real transcript tables are written
    # partitioned/sorted by conversation (the Iceberg layout the north
    # rule assumes); the synthetic source mirrors that.
    parts = spark.range(0, n_partitions, 1, n_partitions)

    def gen(iterator):
        for pdf in iterator:
            for pid in pdf["id"]:
                pid = int(pid)
                n = min(per_part, n_turns - pid * per_part)
                if n <= 0:
                    continue
                # conv-id space is partitioned: each slice owns a
                # disjoint conv range, so (conv_id, turn_idx) is unique
                out = generate_pandas(n, seed=seed + pid, start_conv=pid * 10_000_000)
                yield out

    return parts.mapInPandas(gen, schema=schema)
