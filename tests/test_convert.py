"""Format converters (S7/S11 analogs): parquet <-> csv round trip."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def test_roundtrip(ray_session, tmp_path):
    from multimedia_indexing_ray.sources.convert import csv_to_parquet, parquet_to_csv

    src = tmp_path / "in.parquet"
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    pq.write_table(t, src)

    n = parquet_to_csv(str(src), str(tmp_path / "csv"))
    assert n == 3
    n2 = csv_to_parquet(
        [str(tmp_path / "csv" / f) for f in os.listdir(tmp_path / "csv")],
        str(tmp_path / "pq2"),
    )
    assert n2 == 3
    import glob

    back = pq.ParquetDataset(sorted(glob.glob(str(tmp_path / "pq2" / "*")))).read()
    df = back.to_pandas().sort_values("a").reset_index(drop=True)
    pd.testing.assert_frame_equal(df, t.to_pandas())
