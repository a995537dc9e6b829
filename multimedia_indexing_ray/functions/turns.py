"""Per-turn base featurizers — vectorized pyarrow.compute kernels.

The analog of the reference's per-image local-descriptor extraction
(`visual/extraction/SURFExtractor.java:44-59` — image → per-point rows):
here each turn row yields scalar per-turn features (SURVEY.md §2.2 M4).
All kernels are Arrow-native; no Python row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"


def text_len(text: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Character count (utf8 code points) as float64; '' -> 0."""
    return pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)


def n_tokens(text: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Whitespace-delimited token count (maximal runs of non-space).

    trim + split_whitespace is ~2x the regex-count kernel on the bench
    table and verified count-identical to `\\S+` matching (the DuckDB
    oracle's regexp_extract_all)."""
    # ascii_* variants: RE2's \s is ASCII-only, so the unicode-aware
    # utf8_split_whitespace would split on NBSP/em-space and diverge from
    # the `\S+` oracle (verified with U+00A0 / U+2003)
    trimmed = pc.ascii_trim_whitespace(text)
    lens = pc.list_value_length(pc.ascii_split_whitespace(trimmed)).to_numpy(
        zero_copy_only=False
    )
    empty = pc.equal(pc.utf8_length(trimmed), 0).to_numpy(zero_copy_only=False)
    return np.where(empty, 0, lens).astype(np.float64)


def role_onehots(role: pa.ChunkedArray | pa.Array) -> dict:
    out = {}
    for name, value in (
        ("is_user", "user"),
        ("is_assistant", "assistant"),
        ("is_system", "system"),
        ("is_tool_role", "tool"),
    ):
        out[name] = (
            pc.equal(role, value).to_numpy(zero_copy_only=False).astype(np.float64)
        )
    return out


def has_tool(tool: pa.ChunkedArray | pa.Array) -> np.ndarray:
    return pc.is_valid(tool).to_numpy(zero_copy_only=False).astype(np.float64)


def base_turn_features(batch: pa.Table) -> dict:
    """All base per-turn features except gap_s (which needs sorted order).

    Returns a dict of float64 numpy arrays keyed by specs.BASE_FEATURES
    names (gap_s excluded — computed by the window kernel after sorting).
    """
    feats = {
        "text_len": text_len(batch["text"]),
        "n_tokens": n_tokens(batch["text"]),
    }
    feats.update(role_onehots(batch["role"]))
    feats["has_tool"] = has_tool(batch["tool"])
    return feats
