"""Feature / window specifications — the "codebook" of the engine.

The reference loads codebook CSVs once per worker and the concatenation of
per-vocabulary VLAD blocks defines the output vector layout
(``visual/vectorization/ImageVectorizer.java:101-112``,
``visual/aggregation/VladAggregatorMultipleVocabularies.java:58-75``).
Here the analog is a declarative registry of window/feature specs whose
block concatenation pins the fixed output dimension D and the block order;
fixtures and the oracle agree on this layout bytewise.

Visibility semantics (zero temporal leakage — the hard invariant):

- A feature at row ``(conv_id, ts)`` may only depend on rows of the same
  conversation with ``ts' <= ts``.  Rows with equal ``ts`` are mutually
  visible regardless of ``turn_idx`` (FIXTURES.md conv-000001 tie rule).
- Sliding windows are half-open ``(ts - width, ts]`` unless
  ``closed="both"`` (the closed variant matches SQL ``RANGE BETWEEN x
  PRECEDING AND CURRENT ROW`` frames and is used by the DuckDB oracle
  queries).
- Tumbling windows aggregate rows in the window containing ``ts`` that are
  also visible (``ts' <= ts``) — i.e. a within-window prefix aggregate.
- Sessions: a new session starts at a row whose inactivity gap is
  *strictly greater* than ``gap_s`` (gap == threshold stays in the same
  session; FIXTURES.md conv-000004 boundary condition).
- Lag features are positional (k rows back within the conversation under
  the stable ordering ``(conv_id, ts, turn_idx)``) and are leakage-free.
  Lead features look *forward* and are therefore emitted as separate
  label-side columns (``lead_*``), never inside the point-in-time vector.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Optional, Tuple

# Per-turn base features computed by functions/turns.py (order pinned).
BASE_FEATURES: Tuple[str, ...] = (
    "text_len",
    "n_tokens",
    "gap_s",
    "is_user",
    "is_assistant",
    "is_system",
    "is_tool_role",
    "has_tool",
)

# Aggregates emitted per window block (order pinned): count of visible
# rows matching the condition, sum/mean of text_len, sum of n_tokens.
# mean is 0.0 for an empty window — the reference's empty-aggregation
# convention (zero VLAD vector for a 0-descriptor image,
# visual/aggregation/VladAggregator.java:37-39).
WINDOW_AGGS: Tuple[str, ...] = ("count", "sum_text_len", "mean_text_len", "sum_n_tokens")

Condition = Optional[Tuple[str, str]]  # None | ("role", value) | ("tool_notnull", "")


@dataclass(frozen=True)
class SlidingSpec:
    """Sliding window ending at each row's ts."""

    name: str
    width_s: float
    condition: Condition = None
    closed: Literal["right", "both"] = "right"  # right = (t-W, t]; both = [t-W, t]

    @property
    def columns(self) -> Tuple[str, ...]:
        return tuple(f"{self.name}_{a}" for a in WINDOW_AGGS)


@dataclass(frozen=True)
class TumblingSpec:
    """Tumbling (fixed, epoch-aligned) window; prefix aggregate up to ts."""

    name: str
    width_s: float
    condition: Condition = None

    @property
    def columns(self) -> Tuple[str, ...]:
        return tuple(f"{self.name}_{a}" for a in WINDOW_AGGS)


@dataclass(frozen=True)
class SessionSpec:
    """Inactivity-gap sessionization features."""

    name: str
    gap_s: float

    @property
    def columns(self) -> Tuple[str, ...]:
        return (
            f"{self.name}_turns_so_far",
            f"{self.name}_duration_so_far_s",
            f"{self.name}_session_idx",
        )


@dataclass(frozen=True)
class LagSpec:
    """Positional lag of a base feature, 0.0-filled at conversation start."""

    feature: str
    k: int

    @property
    def columns(self) -> Tuple[str, ...]:
        return (f"lag{self.k}_{self.feature}",)


@dataclass(frozen=True)
class LeadSpec:
    """Positional lead — label-side column, NOT part of the feature vector."""

    feature: str
    k: int

    @property
    def columns(self) -> Tuple[str, ...]:
        return (f"lead{self.k}_{self.feature}",)


@dataclass(frozen=True)
class FeatureSpecs:
    """Full registry; concatenation order defines the output layout."""

    sliding: Tuple[SlidingSpec, ...] = ()
    tumbling: Tuple[TumblingSpec, ...] = ()
    session: Tuple[SessionSpec, ...] = ()
    lags: Tuple[LagSpec, ...] = ()
    leads: Tuple[LeadSpec, ...] = ()
    include_base: bool = True

    def feature_columns(self) -> Tuple[str, ...]:
        """Point-in-time feature columns, in vector order (no leads)."""
        cols: list[str] = []
        if self.include_base:
            cols.extend(BASE_FEATURES)
        for s in self.sliding:
            cols.extend(s.columns)
        for t in self.tumbling:
            cols.extend(t.columns)
        for s in self.session:
            cols.extend(s.columns)
        for l in self.lags:
            cols.extend(l.columns)
        return tuple(cols)

    def lead_columns(self) -> Tuple[str, ...]:
        cols: list[str] = []
        for l in self.leads:
            cols.extend(l.columns)
        return tuple(cols)

    @property
    def dim(self) -> int:
        return len(self.feature_columns())

    def max_window_width_s(self) -> float:
        """Largest lookback horizon (for hot-key split safety margins)."""
        widths = [s.width_s for s in self.sliding] + [t.width_s for t in self.tumbling]
        return max(widths, default=0.0)

    def max_lag_depth(self) -> int:
        ks = [l.k for l in self.lags] + [1]  # gap_s itself is a 1-row lookback
        return max(ks)


DEFAULT_SPECS = FeatureSpecs(
    sliding=(
        SlidingSpec("slide_300s_all", 300.0, None),
        SlidingSpec("slide_1800s_user", 1800.0, ("role", "user")),
        SlidingSpec("slide_1800s_assistant", 1800.0, ("role", "assistant")),
        SlidingSpec("slide_1800s_tool", 1800.0, ("tool_notnull", "")),
    ),
    tumbling=(TumblingSpec("tumble_3600s_all", 3600.0, None),),
    session=(SessionSpec("sess_1800s", 1800.0),),
    lags=(
        LagSpec("text_len", 1),
        LagSpec("text_len", 2),
        LagSpec("text_len", 3),
        LagSpec("gap_s", 1),
        LagSpec("gap_s", 2),
        LagSpec("gap_s", 3),
    ),
    leads=(LeadSpec("text_len", 1),),
)


def feature_names(specs: FeatureSpecs = DEFAULT_SPECS) -> Tuple[str, ...]:
    return specs.feature_columns()


# Epoch origin for tumbling-window alignment (timestamp[us] zero point).
TUMBLING_ORIGIN_US = 0
