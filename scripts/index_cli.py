#!/usr/bin/env python
"""ANN index lifecycle CLI — the reference's example-driver analogs
(`visual/examples/FolderIndexingMT.java` build/append loop,
`visual/examples/YFCC100MExample.java` load-and-serve loop) on the
parquet index artifact.

    python scripts/index_cli.py build  --input emb.parquet --index /idx \
        --kind ivfpq --n-lists 64 --m 32 --ks 256
    python scripts/index_cli.py append --input more.parquet --index /idx
    python scripts/index_cli.py search --index /idx --queries q.parquet \
        --k 10 --probe 8
    python scripts/index_cli.py stats  --index /idx
    python scripts/index_cli.py dump   --index /idx --out dump.csv --limit 100

Owns its Ray session (standalone); guards init for shared sessions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["build", "append", "search", "stats", "dump"])
    p.add_argument("--input", help="parquet file/dir of (id, vector) rows")
    p.add_argument("--index", required=True, help="index artifact dir")
    p.add_argument("--queries", help="parquet of query vectors (search)")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--id-col", default="vec_id")
    p.add_argument("--kind", default="ivf", choices=["ivf", "pq", "ivfpq"])
    p.add_argument("--n-lists", type=int, default=16)
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--ks", type=int, default=256)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--probe", type=int, default=None)
    p.add_argument("--n-queries", type=int, default=5)
    p.add_argument("--out", help="output path (dump)")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = p.parse_args()

    import ray

    if args.cmd in ("build", "append", "search") and not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )

    from multimedia_indexing_ray.stages import ann_index as ai

    if args.cmd == "build":
        man = ai.build_ann_index(
            _read(args.input, args.vec_col, args.id_col),
            args.index,
            vec_col=args.vec_col,
            id_col=args.id_col,
            kind=args.kind,
            n_lists=args.n_lists,
            m=args.m,
            ks=args.ks,
        )
        print(json.dumps({"segments": man["segments"], "kind": man["kind"]}))
    elif args.cmd == "append":
        man = ai.append_to_index(_read(args.input, args.vec_col, args.id_col), args.index)
        print(json.dumps({"segments": man["segments"]}))
    elif args.cmd == "search":
        import numpy as np
        import pyarrow.parquet as papq

        t = papq.read_table(args.queries, columns=[args.id_col, args.vec_col])
        ids = t[args.id_col].to_numpy()[: args.n_queries]
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in t[args.vec_col].to_pylist()[: args.n_queries]]
        )
        res = ai.ann_search(args.index, (ids, mat), k=args.k, probe=args.probe).to_pandas()
        print(res.to_csv(index=False))
    elif args.cmd == "stats":
        print(json.dumps(ai.index_stats(args.index)))
    elif args.cmd == "dump":
        n = ai.dump_index(args.index, args.out, limit=args.limit)
        print(json.dumps({"rows": n, "out": args.out}))

    import ray as _r

    if _r.is_initialized():
        _r.shutdown()


def _read(path: str, vec_col: str, id_col: str):
    import ray.data

    return ray.data.read_parquet(path, columns=[id_col, vec_col])


if __name__ == "__main__":
    main()
