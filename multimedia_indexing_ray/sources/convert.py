"""Whole-dataset format converters — the FeatureIO text<->binary analog.

The reference converts entire feature folders between text (CSV) and
binary framing (`visual/utilities/FeatureIO.java:140-171,181-223`); here
the equivalents are one-shot streaming jobs between CSV and Parquet (and
a CSV export for inspection, the index-dump analog S11,
`visual/datastructures/AbstractSearchStructure.java:611-646`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import ray.data


def csv_to_parquet(
    src: Union[str, Sequence[str]],
    out_dir: str,
    columns: Optional[Sequence[str]] = None,
) -> int:
    """Streaming CSV -> Parquet; returns row count."""
    ds = ray.data.read_csv(src)
    if columns:
        ds = ds.select_columns(list(columns))
    ds = ds.materialize()
    ds.write_parquet(out_dir)
    return ds.count()  # count the converted input, not the (possibly
    # pre-populated) output directory


def parquet_to_csv(
    src: Union[str, Sequence[str]],
    out_dir: str,
    columns: Optional[Sequence[str]] = None,
) -> int:
    """Streaming Parquet -> CSV (inspection/export); returns row count."""
    ds = ray.data.read_parquet(src, columns=list(columns) if columns else None)
    ds = ds.materialize()
    ds.write_csv(out_dir)
    return ds.count()
