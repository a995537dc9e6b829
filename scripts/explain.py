"""Per-operator wall-time breakdown for a registry query — the tuning
loop the docs prescribe ("read ds.stats() and iterate until wall-time is
dominated by useful compute").

Usage:  python scripts/explain.py <query> [sf_dir] [--full]

Prints one line per Ray Data operator (name, wall time, output rows,
output bytes) plus the total, or the raw ``ds.stats()`` dump with
``--full``.  Owns its Ray session (script entry point)."""

from __future__ import annotations

import os
import re
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        raise SystemExit(2)
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from multimedia_indexing_ray.pipelines import queries as q

    fn = q.queries()[name]
    t0 = time.perf_counter()
    res = fn(sf_dir)
    if hasattr(res, "materialize"):
        res = res.materialize()
        wall = time.perf_counter() - t0
        stats = res.stats()
        if "--full" in sys.argv:
            print(stats)
        else:
            # one line per operator: name, wall clock, task count, rows out
            for block in re.split(r"\n(?=Operator )", stats):
                m = re.match(r"Operator (\d+) (.+?):(?: (\d+) tasks executed,)?.*?"
                             r"(?:executed )?in ([\d.]+)(m?s)", block, re.S)
                if not m:
                    continue
                secs = float(m.group(4)) / (1000.0 if m.group(5) == "ms" else 1.0)
                rows = re.search(r"Output num rows per block: .*?, (\d+) total", block)
                print(
                    f"op{m.group(1):>3}  {secs:7.2f}s  "
                    f"{(m.group(3) or '-'):>5} tasks  "
                    f"{(rows.group(1) if rows else '-'):>10} rows  {m.group(2)[:70]}"
                )
        print(f"TOTAL {name}: {wall:.2f}s, {res.count()} rows")
    else:
        wall = time.perf_counter() - t0
        print(f"TOTAL {name}: {wall:.2f}s, {len(res)} rows (driver-side result; no ds.stats)")
    ray.shutdown()


if __name__ == "__main__":
    main()
