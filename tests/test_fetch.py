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


class _FakeResp:
    """Minimal urlopen response: context manager + headers + chunked read."""

    def __init__(self, body: bytes, content_length=None):
        self._body = body
        self._pos = 0
        import email.message

        self.headers = email.message.Message()
        if content_length is not None:
            self.headers["Content-Length"] = str(content_length)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def read(self, n=-1):
        if n is None or n < 0:
            n = len(self._body) - self._pos
        chunk = self._body[self._pos : self._pos + n]
        self._pos += len(chunk)
        return chunk


def test_http_transport_success_and_error_mapping():
    """Real HTTP transport (urllib) exercised with an injected urlopen —
    the container has no network, so this is the CI path; the semantics
    (5 s timeout, size cap, no retries) mirror ImageDownload.java:163-175."""
    import socket
    import urllib.error

    from multimedia_indexing_ray.stages.fetch import http_transport

    body = b"jpeg-bytes" * 100
    assert (
        http_transport("http://h/x.jpg", _urlopen=lambda req, timeout: _FakeResp(body))
        == body
    )

    def raise_404(req, timeout):
        raise urllib.error.HTTPError("http://h/x", 404, "nf", None, None)

    with pytest.raises(FetchError, match="not_found"):
        http_transport("http://h/x", _urlopen=raise_404)

    def raise_503(req, timeout):
        raise urllib.error.HTTPError("http://h/x", 503, "busy", None, None)

    with pytest.raises(FetchError, match="http_503"):
        http_transport("http://h/x", _urlopen=raise_503)

    def raise_timeout(req, timeout):
        raise socket.timeout()

    with pytest.raises(FetchError, match="timeout"):
        http_transport("http://h/x", _urlopen=raise_timeout)

    def raise_dns(req, timeout):
        raise urllib.error.URLError(OSError("no such host"))

    with pytest.raises(FetchError, match="connect_failed"):
        http_transport("http://h/x", _urlopen=raise_dns)


def test_http_transport_size_cap_header_and_streamed():
    """too_large fires BEFORE the read when Content-Length admits it, and
    mid-stream otherwise (never buffers past the cap)."""
    from multimedia_indexing_ray.stages.fetch import http_transport

    with pytest.raises(FetchError, match="too_large"):
        http_transport(
            "http://h/big",
            max_bytes=64,
            _urlopen=lambda req, timeout: _FakeResp(b"", content_length=1 << 30),
        )
    with pytest.raises(FetchError, match="too_large"):  # no/lying header
        http_transport(
            "http://h/big",
            max_bytes=64,
            _urlopen=lambda req, timeout: _FakeResp(b"z" * 200, content_length=1),
        )


def test_auto_transport_dispatch(tmp_path, monkeypatch):
    """Scheme routing: file:// resolves locally; http is gated on
    GRAFT_ENABLE_HTTP so the sandbox fails soft and a deploy flips one env."""
    from multimedia_indexing_ray.stages import fetch as fetch_mod
    from multimedia_indexing_ray.stages.fetch import auto_transport

    p = tmp_path / "a.bin"
    p.write_bytes(b"local")
    assert auto_transport(f"file://{p}") == b"local"

    monkeypatch.delenv("GRAFT_ENABLE_HTTP", raising=False)
    with pytest.raises(FetchError, match="no_network_in_container"):
        auto_transport("http://example.com/x.jpg")

    monkeypatch.setenv("GRAFT_ENABLE_HTTP", "1")
    monkeypatch.setattr(
        fetch_mod.urllib.request,
        "urlopen",
        lambda req, timeout: _FakeResp(b"served"),
    )
    assert auto_transport("http://example.com/x.jpg") == b"served"


def test_url_fetch_phash_dups_query(ray_session):
    """The chained fetch -> decode -> phash registry query matches its
    pure-id oracle: every cross-format planted pair (PGM base vs
    PNG/GIF/BMP re-encode fetched over file://) and nothing else."""
    from multimedia_indexing_ray.pipelines.queries import REGISTRY

    out = REGISTRY["url_fetch_phash_dups"].fn("unused").to_pandas()
    out = out.sort_values(["media_id_a", "media_id_b"]).reset_index(drop=True)
    assert len(out) == 48
    assert list(out.media_id_a) == [f"m-{i:04d}" for i in range(48)]
    assert list(out.media_id_b) == [f"m-{i + 48:04d}" for i in range(48)]


def test_http_transport_nonstandard_exceptions_mapped():
    """IncompleteRead (HTTPException, not OSError) and malformed-URL
    ValueError must land in the documented reason vocabulary
    (review-found taxonomy escapes)."""
    import http.client

    from multimedia_indexing_ray.stages.fetch import FetchError, http_transport

    class _IncompleteBody:
        headers = None
        def __enter__(self):
            return self
        def __exit__(self, *a):
            return False
        def read(self, n):
            raise http.client.IncompleteRead(b"partial")

    with pytest.raises(FetchError, match="read_failed"):
        http_transport("http://x/", _urlopen=lambda req, timeout: _IncompleteBody())

    def _bad_url(req, timeout):
        raise ValueError("unknown url type: 'htp'")

    with pytest.raises(FetchError, match="connect_failed"):
        http_transport("htp://x/", _urlopen=_bad_url)

    def _bad_status(req, timeout):
        raise http.client.BadStatusLine("garbage")

    with pytest.raises(FetchError, match="connect_failed"):
        http_transport("http://x/", _urlopen=_bad_status)
