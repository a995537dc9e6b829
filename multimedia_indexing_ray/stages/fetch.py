"""I/O-bound URL fetch stage — SURVEY §2.1 S3 (the reference's
rate-limited download pool: `download/ImageDownload.java:152-260`,
driver loop `examples/UrlIndexingMT.java:84-149`).

The reference pulls images over HTTP with 5 s connect/read timeouts, a
``minCallInterval`` floor between requests per pool
(`UrlIndexingMT.java:84,118-126`), and counts-and-skips failures
without retrying (`UrlIndexingMT.java:154-191`; its ``maxRetries`` is
documented "currently not used").  This engine keeps those exact
semantics in a Ray-idiomatic shape:

- the fetcher is an actor-pool ``map_batches`` class — one transport +
  one rate-limiter state per ACTOR, fetch-per-row inside the batch
  (fetching is inherently per-URL; the payloads land in an Arrow binary
  column, never a Python row path downstream);
- Ray Data's streaming executor supplies the bounded-queue backpressure
  the reference hand-rolls (``numPendingTasks < 10×numThreads``);
- failures NEVER crash the batch: they surface in a ``fetch_error``
  side-channel column (same contract as `stages/multimodal.py`'s
  decoders) and the payload is null;
- an oversized body is a failure (``too_large``), mirroring the media
  decoders' memory-bomb caps — at web scale one 10 GB response must not
  OOM a worker heap.

A real HTTP(S) transport (`http_transport`: urllib, the reference's 5 s
timeouts, streamed size cap) ships alongside the ``file://`` one; the
default `auto_transport` dispatches by scheme and enables HTTP only
when ``GRAFT_ENABLE_HTTP=1`` — this sandboxed container has no network,
so CI exercises the HTTP path with an injected ``_urlopen`` and the
``file://`` path end-to-end, keeping every OTHER part real: the
actor-pool shape, the rate limiter, the timeout accounting, the error
channel and the size cap.  Tests inject flaky and slow transports via
the ``transport=`` constructor arg the same way.
"""

from __future__ import annotations

import http.client
import os
import socket
import time
import urllib.error
import urllib.request
from typing import Callable, Optional

import numpy as np
import pyarrow as pa


class FetchError(Exception):
    """Transport failure with a short machine-readable reason."""

    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


DEFAULT_MAX_BYTES = 64 * 1024 * 1024  # one response must fit a worker heap


def file_transport(url: str, max_bytes: int = DEFAULT_MAX_BYTES) -> bytes:
    """``file://`` / bare-path transport: the no-network container's
    stand-in for HTTP GET.  Raises `FetchError` with reasons shaped like
    an HTTP client's: not_found, too_large, read_failed."""
    path = url[7:] if url.startswith("file://") else url
    if url.startswith(("http://", "https://")):
        raise FetchError("no_network_in_container")
    try:
        size = os.path.getsize(path)
    except OSError:
        raise FetchError("not_found")
    if size > max_bytes:
        raise FetchError("too_large")
    try:
        with open(path, "rb") as f:
            return f.read(max_bytes + 1)
    except OSError:
        raise FetchError("read_failed")


_HTTP_CHUNK = 1 << 20  # stream responses in 1 MiB reads


def http_transport(
    url: str,
    timeout_s: float = 5.0,
    max_bytes: int = DEFAULT_MAX_BYTES,
    _urlopen: Optional[Callable] = None,
) -> bytes:
    """Real HTTP(S) GET with the reference's semantics
    (`download/ImageDownload.java:163-175`): 5 s connect/read timeout,
    no retries, and a hard size cap so one huge response can't OOM a
    worker.  The body is STREAMED in 1 MiB chunks and abandoned the
    moment it exceeds ``max_bytes`` — never buffered past the cap.

    Raises `FetchError` with the same reason vocabulary as
    `file_transport` (not_found, too_large, timeout, read_failed) plus
    ``http_<status>`` for non-404 status codes and ``connect_failed``
    for DNS/refused-connection errors.

    Untestable end-to-end in this no-network container (CI exercises it
    with an injected ``_urlopen``); selected at runtime via
    ``GRAFT_ENABLE_HTTP=1`` (see `auto_transport`) so a networked deploy
    needs zero code change.
    """
    if _urlopen is None:  # resolved at call time so tests can monkeypatch
        _urlopen = urllib.request.urlopen
    req = urllib.request.Request(url, headers={"User-Agent": "mir-fetch/1.0"})
    try:
        resp = _urlopen(req, timeout=timeout_s)
    except urllib.error.HTTPError as e:
        raise FetchError("not_found" if e.code == 404 else f"http_{e.code}")
    except (socket.timeout, TimeoutError):
        raise FetchError("timeout")
    except urllib.error.URLError as e:
        if isinstance(e.reason, (socket.timeout, TimeoutError)):
            raise FetchError("timeout")
        raise FetchError("connect_failed")
    except OSError:
        raise FetchError("connect_failed")
    except http.client.HTTPException:
        # BadStatusLine / LineTooLong etc. are not OSError subclasses
        raise FetchError("connect_failed")
    except ValueError:
        raise FetchError("connect_failed")  # malformed URL ('htp://…')
    with resp:
        clen = resp.headers.get("Content-Length") if resp.headers else None
        if clen is not None:
            try:
                if int(clen) > max_bytes:
                    raise FetchError("too_large")  # reject before reading
            except ValueError:
                pass  # lying/garbage header: fall through to streamed cap
        chunks, total = [], 0
        while True:
            try:
                chunk = resp.read(_HTTP_CHUNK)
            except (socket.timeout, TimeoutError):
                raise FetchError("timeout")
            except (OSError, http.client.HTTPException):
                # IncompleteRead (mid-body disconnect) is an
                # HTTPException, not an OSError — same taxonomy slot
                raise FetchError("read_failed")
            if not chunk:
                break
            total += len(chunk)
            if total > max_bytes:
                raise FetchError("too_large")
            chunks.append(chunk)
    return b"".join(chunks)


def auto_transport(
    url: str,
    timeout_s: float = 5.0,
    max_bytes: int = DEFAULT_MAX_BYTES,
) -> bytes:
    """Scheme dispatcher — the `UrlFetcher` default.  ``http(s)://`` goes
    to `http_transport` when ``GRAFT_ENABLE_HTTP=1`` is set (a networked
    deploy flips one env var); in this no-network sandbox it fails soft
    as ``no_network_in_container``.  Everything else (``file://`` and
    bare paths) resolves locally."""
    if url.startswith(("http://", "https://")):
        if os.environ.get("GRAFT_ENABLE_HTTP") == "1":
            return http_transport(url, timeout_s=timeout_s, max_bytes=max_bytes)
        raise FetchError("no_network_in_container")
    return file_transport(url, max_bytes=max_bytes)


class UrlFetcher:
    """Actor-pool fetch stage: ``(url_id, url)`` rows -> same rows +
    ``payload`` (binary, null on failure) + ``fetch_bytes`` (int64, -1 on
    failure) + ``fetch_error`` (string side-channel, null on success).

    - ``min_call_interval_s``: floor between fetch STARTS per actor
      (`UrlIndexingMT.minCallInterval`); total request rate ≈
      concurrency / interval, so size the pool, not the sleep.
    - ``timeout_s``: a fetch slower than this is recorded as
      ``fetch_error='timeout'`` and its payload dropped (the file
      transport cannot abort mid-read the way a socket timeout does, so
      the budget is enforced on completion — same observable result:
      the row fails, the batch survives).
    - failures are counted and skipped, never retried, matching the
      reference driver (`UrlIndexingMT.java:154-191`).

    ``clock``/``sleep`` are injectable for deterministic tests."""

    def __init__(
        self,
        transport: Optional[Callable[[str], bytes]] = None,
        min_call_interval_s: float = 0.0,
        timeout_s: float = 5.0,
        max_bytes: int = DEFAULT_MAX_BYTES,
        url_col: str = "url",
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self._transport = transport or (
            lambda u: auto_transport(
                u, timeout_s=timeout_s, max_bytes=max_bytes
            )
        )
        self._interval = float(min_call_interval_s)
        self._timeout = float(timeout_s)
        self._max_bytes = int(max_bytes)
        self._url_col = url_col
        self._clock = clock
        self._sleep = sleep
        self._next_allowed = -np.inf  # rate-limiter state, per ACTOR
        self.n_failed = 0  # failure counter (A6 metric analog)

    def _fetch_one(self, url: str) -> "tuple[Optional[bytes], Optional[str]]":
        if self._interval > 0.0:
            now = self._clock()
            if now < self._next_allowed:
                self._sleep(self._next_allowed - now)
            self._next_allowed = max(self._next_allowed, now) + self._interval
        t0 = self._clock()
        try:
            body = self._transport(url)
        except FetchError as e:
            return None, f"fetch_failed:{e.reason}"
        except Exception as e:  # transport bug must not kill the batch
            return None, f"fetch_failed:{type(e).__name__}"
        if self._clock() - t0 > self._timeout:
            return None, "fetch_failed:timeout"
        if len(body) > self._max_bytes:
            return None, "fetch_failed:too_large"
        return body, None

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, errors = [], []
        for url in batch[self._url_col].to_pylist():
            body, err = self._fetch_one(url)
            if err is not None:
                self.n_failed += 1
            payloads.append(body)
            errors.append(err)
        sizes = [(-1 if p is None else len(p)) for p in payloads]
        return (
            batch.append_column("payload", pa.array(payloads, pa.binary()))
            .append_column("fetch_bytes", pa.array(sizes, pa.int64()))
            .append_column("fetch_error", pa.array(errors, pa.string()))
        )


def fetch_urls(
    ds: "ray.data.Dataset",
    concurrency: int = 8,
    batch_size: int = 32,
    **fetcher_kwargs,
) -> "ray.data.Dataset":
    """URL table -> table + payload/fetch_bytes/fetch_error columns.

    An I/O-bound stage wants MORE actors than CPU-bound ones and tiny
    CPU reservations — fetchers spend their life blocked on I/O, so
    ``num_cpus=0.25`` lets the scheduler co-locate them with compute
    stages instead of starving the pipeline (SURVEY §2.9's 10-thread
    download pool next to the 2-thread vectorizer)."""
    return ds.map_batches(
        UrlFetcher,
        fn_constructor_kwargs=fetcher_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=0.25,
        max_restarts=0,  # ray#53727, see multimodal.decode_and_featurize
    )


def write_url_fixture(root: str, n: int = 128) -> pa.Table:
    """Deterministic local URL corpus for the S3 queries/tests: file
    ``u-i`` holds its own id ASCII-repeated ``8 + (i % 7) * 3`` times, so
    the fetched byte count is pure id arithmetic (SQL-expressible:
    ``6 * (8 + i%7*3)``).  Every third-of-eleven id points at a missing
    file (the planted fetch failure).  Content is a pure function of the
    id (no seed), so any two writers produce identical bytes.

    Callers sharing a FIXED root must not run concurrently (the 'wb'
    rewrite is not atomic) — use a fresh per-run directory when racing
    is possible (see `q_url_fetch_manifest`)."""
    os.makedirs(root, exist_ok=True)
    ids, urls = [], []
    for i in range(n):
        uid = f"u-{i:04d}"
        ids.append(uid)
        if i % 11 == 3:
            urls.append(f"file://{root}/missing-{uid}.bin")  # never written
            continue
        path = os.path.join(root, f"{uid}.bin")
        body = uid.encode("ascii") * (8 + (i % 7) * 3)
        with open(path, "wb") as f:
            f.write(body)
        urls.append(f"file://{path}")
    return pa.table({"url_id": pa.array(ids, pa.string()),
                     "url": pa.array(urls, pa.string())})
