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

    Stays on the `\\S+` RE2 kernel: the split_whitespace variants
    (utf8_* splits NBSP/em-space, ascii_* splits vertical tab) both
    diverge from RE2's \s = [\t\n\f\r ] and would break the
    bit-exact DuckDB oracle parity of every n_tokens-derived window
    feature (verified)."""
    return (
        pc.count_substring_regex(text, TOKEN_RE).to_numpy(zero_copy_only=False).astype(np.float64)
    )


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
