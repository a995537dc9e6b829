"""Deterministic synthetic transcript fixtures (FIXTURES.md).

The reference ships no test suite (SURVEY.md §5), so fixtures derive from
the engine's input contract: Parquet transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.  Edge cases mirror behaviors
the reference had to handle: zero-descriptor images → single-turn
conversations (``visual/aggregation/VladAggregator.java:37-39``), skewed
inverted lists → hot conversations (``visual/datastructures/IVFPQ.java:654-673``),
the id-dedup gate → duplicated rows
(``visual/datastructures/AbstractSearchStructure.java:237-240``), and
completion-order nondeterminism → globally shuffled row order.

Everything is generated from fixed seeds — no external data, identical
output on every run.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = 42
ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_P = np.array([0.4, 0.4, 0.05, 0.15])
TOOLS = np.array(["bash", "search", "edit", "read", "browser"])
BASE_TS_US = np.datetime64("2026-01-01T00:00:00", "us").astype("int64")
DAY_US = 86_400_000_000
SESSION_GAP_S = 1800.0  # fixture session threshold (conv-000004 boundary)

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega lorem ipsum dolor sit "
    "amet consectetur adipiscing elit sed do eiusmod tempor incididunt labore"
).split()

TRANSCRIPT_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string(), nullable=False),
        pa.field("turn_idx", pa.int32(), nullable=False),
        pa.field("role", pa.string(), nullable=False),
        pa.field("text", pa.string(), nullable=False),
        pa.field("tool", pa.string(), nullable=True),
        pa.field("ts", pa.timestamp("us"), nullable=False),
    ]
)

TIERS = {
    # tier: (n_convs, turns sampler kind, hot keys)
    "smoke": dict(n_convs=20, hot=0),
    "correctness": dict(n_convs=500, hot=0),
    "bench": dict(n_convs=350_000, hot=3),  # ~10M turns; hot-key skew exercise
}
# "bench4x" (~42M turns) is a WRITE-ONLY tier handled by
# write_transcripts as 4 seeded bench generations with disjoint conv-id
# namespaces: a single 42M-row table would overflow 32-bit string
# offsets and RAM, so generate_transcripts refuses it.
HOT_TURNS = 50_000


def _corpus(rng: np.random.Generator, n_chars: int = 1 << 21) -> str:
    idx = rng.integers(0, len(_WORDS), n_chars // 6)
    return " ".join(_WORDS[i] for i in idx)[:n_chars]


def _texts(rng: np.random.Generator, n: int, corpus: str, max_len: int = 8192) -> list:
    lengths = np.clip(rng.lognormal(4.0, 1.0, n), 0, max_len).astype(np.int64)
    lengths[rng.random(n) < 0.02] = 0  # empty string allowed
    offsets = rng.integers(0, len(corpus) - max_len, n)
    return [corpus[o : o + L] for o, L in zip(offsets, lengths)]


def _turn_counts(rng: np.random.Generator, tier: str, n_convs: int) -> np.ndarray:
    if tier == "smoke":
        counts = rng.integers(1, 13, n_convs)
    else:
        counts = np.clip(rng.lognormal(np.log(20.0), 0.9, n_convs), 1, 400).astype(np.int64)
    # pinned edge-case conversations (FIXTURES.md)
    pinned = [1, 2, 4, 3, 5]  # conv-000000..conv-000004
    counts[: len(pinned)] = pinned[: n_convs]
    return counts.astype(np.int64)


def _segment_cumsum(x: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Cumulative sum restarting at each segment start (x must be >= 0)."""
    c = np.cumsum(x)
    baseline = np.zeros(len(x))
    prev = np.concatenate([[0.0], c[:-1]])
    baseline[starts] = prev[starts]
    np.maximum.accumulate(baseline, out=baseline)  # c nondecreasing => valid carry
    return c - baseline


def generate_transcripts(tier: str = "smoke", seed: int = SEED) -> pa.Table:
    """Generate the T1 transcript table for a tier, already shuffled."""
    if tier == "bench4x":
        raise ValueError(
            "bench4x is write-only (one table would overflow 32-bit string "
            "offsets); use write_transcripts(out_dir, 'bench4x')"
        )
    cfg = TIERS[tier]
    rng = np.random.default_rng(seed)
    n_convs = cfg["n_convs"]
    counts = _turn_counts(rng, tier, n_convs)
    conv_names = np.array([f"conv-{i:06d}" for i in range(n_convs)])
    if cfg["hot"]:
        hot_names = np.array([f"conv-hot-{i}" for i in range(cfg["hot"])])
        conv_names = np.concatenate([conv_names, hot_names])
        counts = np.concatenate([counts, np.full(cfg["hot"], HOT_TURNS, dtype=np.int64)])

    n = int(counts.sum())
    conv_id = np.repeat(conv_names, counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    turn_idx = (np.arange(n) - np.repeat(starts, counts)).astype(np.int32)

    role = ROLES[rng.choice(len(ROLES), n, p=ROLE_P)]
    corpus = _corpus(rng)
    text = _texts(rng, n, corpus)

    tool = np.full(n, None, dtype=object)
    tool_draw = TOOLS[rng.integers(0, len(TOOLS), n)]
    m_tool = (role == "tool") | ((role == "assistant") & (rng.random(n) < 0.1))
    tool[m_tool] = tool_draw[m_tool]

    # timestamps: per-conv start + exp(45s) gaps, 5% session-break gaps
    conv_start = BASE_TS_US + rng.integers(0, 30 * DAY_US, len(counts))
    gaps_s = rng.exponential(45.0, n)
    brk = rng.random(n) < 0.05
    gaps_s[brk] = rng.uniform(2 * 3600.0, 48 * 3600.0, int(brk.sum()))
    is_start = np.zeros(n, dtype=bool)
    is_start[starts] = True
    gaps_s[is_start] = 0.0
    gaps_us = np.round(gaps_s * 1e6).astype(np.int64)
    rel = _segment_cumsum(gaps_us.astype(np.float64), starts).astype(np.int64)
    ts = np.repeat(conv_start, counts) + rel

    # ---- pinned edge cases (present in every tier; n_convs >= 5 always) ----
    s = starts
    # conv-000001: two turns with identical ts
    ts[s[1] + 1] = ts[s[1]]
    # conv-000002: ts order disagrees with turn_idx (swap first two ts)
    t0, t1 = ts[s[2]], ts[s[2] + 1]
    ts[s[2]], ts[s[2] + 1] = t1, t0
    # conv-000003: empty text + null tool on first turn
    text[s[3]] = ""
    tool[s[3]] = None
    role[s[3]] = "assistant"
    # conv-000004: gaps exactly at the sessionization threshold
    thr_us = int(SESSION_GAP_S * 1e6)
    for j in range(1, int(counts[4])):
        ts[s[4] + j] = ts[s[4]] + j * thr_us

    table = pa.table(
        {
            "conv_id": pa.array(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    # global seeded shuffle (completion-order nondeterminism analog)
    perm = np.random.default_rng(seed + 1).permutation(n)
    return table.take(pa.array(perm))


def write_transcripts(out_dir: str, tier: str = "smoke", seed: int = SEED, n_files: int = 8) -> list:
    """Write the shuffled table as >= n_files parquet files (conversations
    straddle file boundaries by construction). Returns the file paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    if tier == "bench4x":
        # 4 seeded bench generations with disjoint conv-id namespaces —
        # one 42M-row table would overflow 32-bit string offsets and RAM
        import pyarrow.compute as _pc

        paths = []
        # distribute n_files across the 4 groups as evenly as possible
        per_group = [max(1, n_files // 4 + (1 if g < n_files % 4 else 0)) for g in range(4)]
        for g in range(4):
            t = generate_transcripts("bench", seed + 17 * g)
            t = t.set_column(
                0,
                "conv_id",
                _pc.replace_substring_regex(t["conv_id"], "^conv", f"g{g}conv"),
            )
            n = t.num_rows
            per = per_group[g]
            bounds = np.linspace(0, n, per + 1).astype(int)
            for i in range(per):
                p = os.path.join(out_dir, f"transcripts-{g}{i:03d}.parquet")
                pq.write_table(t.slice(bounds[i], bounds[i + 1] - bounds[i]), p)
                paths.append(p)
        return paths
    table = generate_transcripts(tier, seed)
    n = table.num_rows
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    paths = []
    for i in range(n_files):
        p = os.path.join(out_dir, f"transcripts-{i:04d}.parquet")
        pq.write_table(table.slice(bounds[i], bounds[i + 1] - bounds[i]), p)
        paths.append(p)
    return paths


def generate_asof_queries(transcripts: pa.Table, seed: int = SEED, n_queries: int | None = None) -> pa.Table:
    """T2 `asof_queries`: (conv_id, ts) probes — exact turn ts, mid-gap,
    before-first (leakage probe), after-last, plus unknown conv ids."""
    rng = np.random.default_rng(seed + 7)
    conv = np.asarray(transcripts["conv_id"])
    ts = np.asarray(transcripts["ts"].cast(pa.int64()))
    order = np.lexsort((ts, conv))
    conv_s, ts_s = conv[order], ts[order]
    n = len(conv_s)
    if n_queries is None:
        n_queries = max(64, n // 2)

    pick = rng.integers(0, n, n_queries)
    q_conv = conv_s[pick].astype(object)
    q_ts = ts_s[pick].copy()
    kind = rng.random(n_queries)
    # p=0.3: ts + U(1us, gap-to-next-turn)
    nxt = np.minimum(pick + 1, n - 1)
    same_conv = conv_s[nxt] == conv_s[pick]
    gap = np.where(same_conv, np.maximum(ts_s[nxt] - ts_s[pick], 2), 60_000_000)
    m = (kind >= 0.5) & (kind < 0.8)
    q_ts[m] = q_ts[m] + rng.integers(1, np.maximum(gap[m], 2))
    # p=0.1: before the conversation's first turn
    m = (kind >= 0.8) & (kind < 0.9)
    q_ts[m] = q_ts[m] - rng.integers(1, 3600_000_000, int(m.sum())) - 10**12
    # p=0.1: after the last turn
    m = kind >= 0.9
    q_ts[m] = q_ts[m] + 10**12 + rng.integers(1, 3600_000_000, int(m.sum()))
    # 2% unknown conv ids
    m = rng.random(n_queries) < 0.02
    q_conv[m] = "conv-unknown"
    return pa.table(
        {
            "conv_id": pa.array(q_conv, pa.string()),
            "ts": pa.array(q_ts, pa.timestamp("us")),
        }
    )


def generate_dup_transcripts(seed: int = SEED) -> pa.Table:
    """T3: smoke tier with 10% exact duplicates and 2% key-duplicates
    (same (conv_id, turn_idx), different text; first-by-ts wins)."""
    t = generate_transcripts("smoke", seed)
    rng = np.random.default_rng(seed + 13)
    n = t.num_rows
    exact = rng.choice(n, max(1, n // 10), replace=False)
    dup_exact = t.take(pa.array(exact))
    keydup_idx = rng.choice(n, max(1, n // 50), replace=False)
    kd = t.take(pa.array(keydup_idx)).to_pydict()
    kd["text"] = [s + " DUPLICATE-VARIANT" for s in kd["text"]]
    kd["ts"] = [v + np.timedelta64(1, "s") for v in np.array(kd["ts"], dtype="datetime64[us]")]
    dup_key = pa.table(
        {
            "conv_id": pa.array(kd["conv_id"], pa.string()),
            "turn_idx": pa.array(kd["turn_idx"], pa.int32()),
            "role": pa.array(kd["role"], pa.string()),
            "text": pa.array(kd["text"], pa.string()),
            "tool": pa.array(kd["tool"], pa.string()),
            "ts": pa.array(np.array(kd["ts"], dtype="datetime64[us]"), pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    out = pa.concat_tables([t, dup_exact, dup_key])
    perm = np.random.default_rng(seed + 14).permutation(out.num_rows)
    return out.take(pa.array(perm))
