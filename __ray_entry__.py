"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` BEFORE importing this module; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship transcript windowed-feature pipeline over
  ``/root/testdata/sf0.001`` (events table adapted to the transcript
  schema) — returns a ``ray.data.Dataset``.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator
  (SURVEY.md §2) from ``multimedia_indexing_ray.pipelines.queries``;
  DuckDB-oracle SQL provided for every SQL-expressible op, rows-only for
  sketch/approximate/vector ops.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multimedia_indexing_ray.pipelines import queries as q


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return q.q_flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
