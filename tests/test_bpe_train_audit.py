"""Planted-semantics tests for the round-5n operators: the distributed
BPE trainer must equal a naive SEQUENTIAL single-process BPE (per-word
symbol lists, no frontier/replace tricks) on a corpus engineered with
overlap runs and cross-round merges, and the FK audit must count
planted orphans/childless/duplicate keys exactly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as papq


def _naive_bpe(texts, rounds):
    """Reference BPE: words as symbol LISTS, greedy left-to-right merge
    application (skip-next after a merge — the run-parity rule),
    winner = (count desc, concatenated-pair-string asc)."""
    words = []
    for t in texts:
        words.extend([list(w) for w in t.split()])
    out = []
    for r in range(1, rounds + 1):
        counts = {}
        for w in words:
            for i in range(len(w) - 1):
                counts[(w[i], w[i + 1])] = counts.get((w[i], w[i + 1]), 0) + 1
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0] + p[1]))
        out.append((r, best[0] + best[1], counts[best]))
        marker = chr(57344 + r - 1)
        new_words = []
        for w in words:
            nw, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and (w[i], w[i + 1]) == best:
                    nw.append(marker)
                    i += 2
                else:
                    nw.append(w[i])
                    i += 1
            new_words.append(nw)
        words = new_words
    return out


def test_bpe_train_matches_sequential_reference(ray_session, tmp_path):
    import __ray_entry__ as e

    # aaaa runs (overlap parity), ab vs ba ties, cross-round merges
    # (round 2+ pairs contain round-1 markers), multi-doc, empty doc
    texts = [
        "aaaa aaa ab ab ba",
        "abab abab banana bandana",
        "aa aa aa b b b",
        "",
        "the cat sat on the mat the end",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(1, 6, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 5, pa.string()),
            "source": pa.array(["s"] * 5, pa.string()),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    papq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        e.queries()["bpe_train_merges"](str(tmp_path))
        .to_pandas()
        .sort_values("round")
        .reset_index(drop=True)
    )
    exp = _naive_bpe(texts, 8)
    got = list(zip(out["round"], out["pair"], out["n"]))
    assert [(int(a), b, int(c)) for a, b, c in got] == exp


def test_bpe_overlap_run_parity(ray_session, tmp_path):
    import __ray_entry__ as e

    # 'aaaaa': the (a,a) pair count is 4 but greedy application merges
    # positions 0-1 and 2-3 only; round 2 then sees (aa_marker, aa_marker)
    texts = ["aaaaa"]
    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"], pa.string()),
            "source": pa.array(["s"], pa.string()),
            "n_chars": pa.array([5], pa.int64()),
        }
    )
    papq.write_table(t, str(tmp_path / "documents.parquet"))
    out = e.queries()["bpe_train_merges"](str(tmp_path)).to_pandas()
    exp = _naive_bpe(texts, 8)
    got = [(int(r), p, int(n)) for r, p, n in zip(out["round"], out["pair"], out["n"])]
    assert got == exp
    assert got[0] == (1, "aa", 4)  # count BEFORE application
    m = chr(57344)
    assert got[1][1] == m + m or got[1][1] == m + "a"  # markers compose


def test_fk_audit_planted(ray_session, tmp_path):
    import __ray_entry__ as e

    US = 1_000_000
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    # orders 1..4 (4 duplicated twice); lineitems for 1 (x2), 2 (x1),
    # and orphans under keys 90, 91 (91 x2): childless = {3, 4}
    o = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4, 4], pa.int64()),
            "o_custkey": pa.array([1] * 5, pa.int64()),
            "o_orderstatus": pa.array(["F"] * 5, pa.string()),
            "o_totalprice": pa.array([1.0] * 5, pa.float64()),
            "o_orderdate": pa.array(np.full(5, base), pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * 5, pa.string()),
        }
    )
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 90, 91, 91], pa.int64()),
            "l_partkey": pa.array([1] * 6, pa.int64()),
            "l_suppkey": pa.array([1] * 6, pa.int64()),
            "l_linenumber": pa.array([1, 2, 1, 1, 1, 2], pa.int64()),
            "l_quantity": pa.array([1.0] * 6, pa.float64()),
            "l_extendedprice": pa.array([1.0] * 6, pa.float64()),
            "l_discount": pa.array([0.0] * 6, pa.float64()),
            "l_tax": pa.array([0.0] * 6, pa.float64()),
            "l_returnflag": pa.array(["N"] * 6, pa.string()),
            "l_linestatus": pa.array(["O"] * 6, pa.string()),
            "l_shipdate": pa.array(np.full(6, base), pa.timestamp("us")),
        }
    )
    papq.write_table(o, str(tmp_path / "orders.parquet"))
    papq.write_table(li, str(tmp_path / "lineitem.parquet"))
    out = (
        e.queries()["fk_integrity_audit"](str(tmp_path))
        .to_pandas()
        .set_index("chk")["n"]
    )
    assert out["orphan_lineitems"] == 3
    assert out["orphan_lineitem_keys"] == 2
    assert out["childless_orders"] == 3  # order 3 plus BOTH rows of key 4
    assert out["matched_orders"] == 2
    assert out["matched_lineitems"] == 3
    assert out["duplicate_order_keys"] == 1


def test_late_supplier_blame_planted(ray_session, tmp_path):
    import __ray_entry__ as e

    US = 1_000_000
    day = 86400 * US
    base = np.datetime64("2024-01-01", "us").astype(np.int64)

    def order(k, status="F"):
        return (k, 1, status, 1.0, base, "1-URGENT")

    # order 1: supp 1 late, supp 2 on time -> blame supp 1
    # order 2: both late -> nobody blamed (nlate = 2)
    # order 3: single supplier late -> not blamed (nsupp = 1)
    # order 4: supp 3 late but order status 'O' -> excluded
    ok, ck, st, tp, od, pr = zip(*[order(1), order(2), order(3), order(4, "O")])
    o = pa.table(
        {
            "o_orderkey": pa.array(ok, pa.int64()),
            "o_custkey": pa.array(ck, pa.int64()),
            "o_orderstatus": pa.array(list(st), pa.string()),
            "o_totalprice": pa.array(tp, pa.float64()),
            "o_orderdate": pa.array(np.array(od, np.int64), pa.timestamp("us")),
            "o_orderpriority": pa.array(list(pr), pa.string()),
        }
    )
    late_ts = base + 61 * day
    ontime_ts = base + 10 * day
    rows = [
        (1, 1, late_ts),
        (1, 2, ontime_ts),
        (2, 1, late_ts),
        (2, 2, late_ts),
        (3, 1, late_ts),
        (4, 3, late_ts),
    ]
    lk, ls, lt = zip(*rows)
    n = len(rows)
    li = pa.table(
        {
            "l_orderkey": pa.array(lk, pa.int64()),
            "l_partkey": pa.array([1] * n, pa.int64()),
            "l_suppkey": pa.array(ls, pa.int64()),
            "l_linenumber": pa.array(list(range(1, n + 1)), pa.int64()),
            "l_quantity": pa.array([1.0] * n, pa.float64()),
            "l_extendedprice": pa.array([1.0] * n, pa.float64()),
            "l_discount": pa.array([0.0] * n, pa.float64()),
            "l_tax": pa.array([0.0] * n, pa.float64()),
            "l_returnflag": pa.array(["N"] * n, pa.string()),
            "l_linestatus": pa.array(["O"] * n, pa.string()),
            "l_shipdate": pa.array(np.array(lt, np.int64), pa.timestamp("us")),
        }
    )
    sup = pa.table(
        {
            "s_suppkey": pa.array([1, 2, 3], pa.int64()),
            "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
            "s_nationkey": pa.array([0, 0, 0], pa.int64()),
            "s_acctbal": pa.array([0.0, 0.0, 0.0], pa.float64()),
        }
    )
    papq.write_table(o, str(tmp_path / "orders.parquet"))
    papq.write_table(li, str(tmp_path / "lineitem.parquet"))
    papq.write_table(sup, str(tmp_path / "supplier.parquet"))
    out = e.queries()["late_supplier_blame"](str(tmp_path)).to_pandas()
    assert dict(zip(out["s_name"], out["numwait"])) == {"S1": 1}
