"""S3 fetch stage (`stages/fetch.py`): rate-limiter floor, timeout
accounting, size cap, failure side-channel, file:// transport, and the
fetch -> decode pipeline composition (the UrlIndexingMT shape)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from multimedia_indexing_ray.stages.fetch import (
    DEFAULT_MAX_BYTES,
    FetchError,
    UrlFetcher,
    fetch_urls,
    file_transport,
    write_url_fixture,
)


def _batch(urls, ids=None):
    ids = ids or [f"u-{i:04d}" for i in range(len(urls))]
    return pa.table({"url_id": pa.array(ids, pa.string()),
                     "url": pa.array(urls, pa.string())})


def test_file_transport_roundtrip_and_errors(tmp_path):
    p = tmp_path / "a.bin"
    p.write_bytes(b"hello" * 10)
    assert file_transport(f"file://{p}") == b"hello" * 10
    assert file_transport(str(p)) == b"hello" * 10  # bare path accepted
    with pytest.raises(FetchError, match="not_found"):
        file_transport(f"file://{tmp_path}/nope.bin")
    with pytest.raises(FetchError, match="too_large"):
        file_transport(str(p), max_bytes=10)
    with pytest.raises(FetchError, match="no_network_in_container"):
        file_transport("http://example.com/x.jpg")


def test_rate_limiter_floor_between_fetch_starts():
    """minCallInterval semantics: fetch STARTS are >= interval apart on
    one actor's clock — verified with an injected deterministic clock."""
    t = [0.0]
    sleeps = []

    def clock():
        return t[0]

    def sleep(dt):
        sleeps.append(dt)
        t[0] += dt

    starts = []

    def transport(url):
        starts.append(t[0])
        t[0] += 0.01  # each fetch takes 10 ms
        return b"x"

    f = UrlFetcher(transport=transport, min_call_interval_s=0.5,
                   clock=clock, sleep=sleep)
    out = f(_batch(["a", "b", "c", "d"]))
    assert out["fetch_error"].null_count == 4
    gaps = np.diff(starts)
    assert (gaps >= 0.5 - 1e-9).all()  # the floor held
    assert len(sleeps) == 3  # first fetch never waits


def test_failures_skip_never_crash_and_are_counted():
    def transport(url):
        if url.endswith("bad"):
            raise FetchError("not_found")
        if url.endswith("boom"):
            raise RuntimeError("transport bug")
        return b"ok-body"

    f = UrlFetcher(transport=transport)
    out = f(_batch(["a", "x-bad", "b", "x-boom"]))
    errs = out["fetch_error"].to_pylist()
    assert errs == [None, "fetch_failed:not_found", None,
                    "fetch_failed:RuntimeError"]
    assert out["fetch_bytes"].to_pylist() == [7, -1, 7, -1]
    assert out["payload"].to_pylist()[1] is None
    assert f.n_failed == 2


def test_timeout_budget_and_size_cap():
    t = [0.0]

    def clock():
        return t[0]

    def transport(url):
        if url == "slow":
            t[0] += 9.0  # exceeds the 5 s budget
            return b"late"
        return b"z" * int(url)

    f = UrlFetcher(transport=transport, timeout_s=5.0, max_bytes=8,
                   clock=clock, sleep=lambda dt: None)
    out = f(_batch(["slow", "4", "9"]))
    assert out["fetch_error"].to_pylist() == [
        "fetch_failed:timeout", None, "fetch_failed:too_large"]


def test_url_fixture_schedule(tmp_path):
    root = str(tmp_path / "corpus")
    urls = write_url_fixture(root, n=23)
    assert len(urls) == 23
    for i, url in enumerate(urls["url"].to_pylist()):
        path = url[7:]
        if i % 11 == 3:
            assert not os.path.exists(path)
        else:
            assert os.path.getsize(path) == 6 * (8 + (i % 7) * 3)
    # idempotent: second write leaves identical bytes
    urls2 = write_url_fixture(root, n=23)
    assert urls.equals(urls2)


def test_fetch_urls_ray_pipeline(ray_session, tmp_path):
    import ray.data as rd

    root = str(tmp_path / "corpus")
    urls = write_url_fixture(root, n=34)
    out = fetch_urls(rd.from_arrow(urls), concurrency=3).to_pandas()
    out = out.sort_values("url_id").reset_index(drop=True)
    assert len(out) == 34
    planted_bad = {f"u-{i:04d}" for i in range(34) if i % 11 == 3}
    bad = out[out["fetch_error"].notna()]
    assert set(bad["url_id"]) == planted_bad
    ok = out[out["fetch_error"].isna()]
    assert (ok["fetch_bytes"] == ok["payload"].map(len)).all()


def test_fetch_then_decode_composition(ray_session, tmp_path):
    """The UrlIndexingMT shape end-to-end: URL list -> fetch pool ->
    tolerant decode -> features, failures from BOTH stages coexisting
    in their side-channels without crashing a batch."""
    import ray.data as rd

    from multimedia_indexing_ray.stages.multimodal import (
        decode_and_featurize,
        make_ppm,
    )

    root = tmp_path / "imgs"
    root.mkdir()
    rows = []
    for i in range(12):
        uid = f"img-{i:04d}"
        if i == 5:
            url = f"file://{root}/missing.ppm"  # fetch-stage failure
        else:
            body = b"P6 not really" if i == 7 else make_ppm(20, 14, seed=i)
            p = root / f"{uid}.ppm"
            p.write_bytes(body)  # i==7: decode-stage failure
            url = f"file://{p}"
        rows.append({"url_id": uid, "url": url})
    urls = pa.Table.from_pylist(rows)

    def _as_media(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_id": t["url_id"],
                "media_type": pa.array(["image"] * len(t), pa.string()),
                "payload": t["payload"],
            }
        )

    fetched = fetch_urls(rd.from_arrow(urls), concurrency=2)
    media = fetched.filter(
        lambda r: r["fetch_error"] is None
    ).map_batches(_as_media, batch_format="pyarrow")
    out = decode_and_featurize(media, codec="real", concurrency=2).to_pandas()
    assert len(out) == 11  # the fetch failure dropped, decode failure kept
    errs = out.set_index("media_id")["decode_error"]
    assert errs.loc["img-0007"].startswith("decode_failed")
    assert errs.drop("img-0007").isna().all()
