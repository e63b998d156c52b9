"""Elasticsearch bulk-protocol writer (live-ES passthrough mode).

Reproduces the reference's NDJSON framing (``bulk/bulk.go:176-245``):

- Index:  ``{"index":{"_id":"ID","_index":"IDX"[,"routing":"R"][,"_type":"T"]}}\\n{doc}\\n``
- Delete: ``{"delete":{"_id":"ID","_index":"IDX"[,...]}}\\n``
- ScriptUpdate: ``{"update":{"_id":...}}\\n{"script":{...},"scripted_upsert":true}\\n``

plus doc-id quote escaping (``internal/bytes/escape.go:10-21``), the
count/byte/time flush triggers (``bulk/bulk.go:110-174``, defaults
``config/config.go:37-58``: 1000 actions / 10 MB / 10 s) and concurrent
request fan-out (``bulk/bulk.go:297-315``).

Engine mapping: framing is a pure function (unit-tested); the writer runs
in ``df.foreachPartition`` so Spark's partition parallelism replaces the
reference's errgroup fan-out, and flush limits bound request size per
partition. HTTP transport is injectable; the container has no ES, so tests
use a recording transport.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.functions import col as F_col

# The foreachPartition closures below reference module-level helpers
# (bulk_payloads, parse_bulk_response); cloudpickle serializes those by
# MODULE REFERENCE unless the module is registered by value — executors of
# an out-of-repo driver (the deployment case) have no
# go_pq_cdc_elasticsearch_spark on sys.path and fail with
# ModuleNotFoundError. Same gate as sources/wal.py / operators/multimodal.py.
try:  # pragma: no cover - trivial registration
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort; in-repo runs work regardless
    pass

DEFAULT_BATCH_SIZE_LIMIT = 1000  # config/config.go:42-44
DEFAULT_BATCH_BYTE_SIZE_LIMIT = 10 * 1024 * 1024  # config/config.go:46-48
DEFAULT_BATCH_TICKER_SECONDS = 10.0  # config/config.go:38-40
FALLBACK_ES_VERSION = "7.0.0"  # client/client.go:38-45


def is_type_supported(es_version: str) -> bool:
    """Whether this ES version still accepts ``_type`` in bulk metadata —
    reference isTypeSupported (bulk/bulk.go:194-206); empty/unknown
    version counts as supported. Deviates from the reference's string
    comparison only where that quirk is an outright bug (see inline)."""
    if not es_version:
        return True
    major = es_version.split(".")[0]
    try:
        # numeric, not the reference's string compare: lexicographic
        # "10" < "8" would re-enable _type on ES >= 10 and get every
        # bulk rejected — identical behavior for every real version 1-9,
        # fixed only where the reference's quirk is an outright bug
        return int(major) < 8
    except ValueError:
        return major < "8"  # non-numeric major: keep reference behavior


def detect_es_version(info_transport: Callable[[], str]) -> str:
    """Detect the cluster version from the Info API body (reference
    detectElasticsearchVersion, client/client.go:51-74): parse
    ``version.number``; any failure falls back to 7.0.0 like the reference
    (client.go:38-45 logs a warning and continues)."""
    try:
        body = json.loads(info_transport())
        number = body["version"]["number"]
        if not isinstance(number, str):
            raise TypeError("version number not found")
        return number
    except Exception:  # noqa: BLE001 — reference swallows and falls back
        return FALLBACK_ES_VERSION


def resolve_type_name(type_name: str | None, es_version: str | None) -> str | None:
    """Gate the configured ``_type`` on the (detected) ES version, like the
    reference passes config.Elasticsearch.TypeName through isTypeSupported
    before framing (bulk/bulk.go:214-228)."""
    if type_name is None or es_version is None:
        return type_name
    return type_name if is_type_supported(es_version) else None


def escape_doc_id(doc_id: str) -> str:
    """Quote-escape a doc id for embedding in raw JSON bytes, byte-for-byte
    the reference's EscapePredefinedBytes (internal/bytes/escape.go:10-21):
    ONLY the quote character is escaped — the reference does not escape
    backslashes. The reference needs this because it builds the metadata
    line by hand from raw bytes; ``action_meta_line`` goes through
    ``json.dumps`` which already escapes, so this helper is NOT applied
    there (doing both would double-escape the id and change document
    identity). Kept as the documented raw-bytes-framing helper."""
    return doc_id.replace('"', '\\"')


def action_meta_line(
    action: str,
    doc_id: str,
    index: str,
    routing: str | None = None,
    type_name: str | None = None,
) -> str:
    """One NDJSON metadata line (reference getEsActionJSON bulk/bulk.go:208-245;
    the _type field is emitted only for ES < 8 — is_type_supported gates at
    major < 8 and tests pin _doc on 7.10 (ES 7 deprecated types but still
    accepts them; 8 removed them), bulk/bulk.go:194-206)."""
    verb = ACTION_VERBS[action]
    meta: dict = {"_id": doc_id, "_index": index}
    if routing is not None:
        meta["routing"] = routing
    if type_name is not None:
        meta["_type"] = type_name
    return json.dumps({verb: meta}, separators=(",", ":"))


# the ONE source of truth for supported action types -> bulk verbs
# (frame_actions validates against the same map action_meta_line frames
# with — review r6: a duplicated whitelist tuple could drift)
ACTION_VERBS = {"index": "index", "delete": "delete", "script_update": "update"}


def frame_actions(
    rows: Iterable[dict],
    type_name: str | None = None,
) -> Iterator[str]:
    """Stream NDJSON lines for an iterable of action rows (dicts with keys
    action, doc_id, index, routing, source). Generator — never materializes
    the full payload (the reference pools buffers for the same reason,
    bulk/bulk.go:188-192)."""
    for r in rows:
        if r["action"] not in ACTION_VERBS:
            # explicit, doc-addressed failure — a bare KeyError from the
            # verb lookup was the same opaque mid-partition death the
            # NULL-source guards below exist to prevent
            raise ValueError(
                f"unknown action {r['action']!r} for doc_id="
                f"{r.get('doc_id')!r} index={r.get('index')!r}: expected "
                f"one of {sorted(ACTION_VERBS)}"
            )
        if r.get("doc_id") is None or r.get("index") is None:
            # one NULL _index/_id poisons the WHOLE bulk request (ES
            # rejects it with HTTP 400 before processing any item), so the
            # per-document rejection actions_from_envelope promises must
            # happen here, with context, before any byte is framed —
            # an unrouted action must not crash-loop the stream blind
            raise ValueError(
                f"{r['action']} action has NULL "
                f"{'doc_id' if r.get('doc_id') is None else 'index'} "
                f"(doc_id={r.get('doc_id')!r} index={r.get('index')!r}) — "
                f"route the envelope (IndexRouter) or filter keyless rows "
                f"before the sink"
            )
        yield action_meta_line(
            r["action"], r["doc_id"], r["index"], r.get("routing"), type_name
        )
        if r["action"] == "index":
            if r["source"] is None:
                # fail HERE with context: ACTION_SCHEMA marks source
                # nullable, and a None reaching '\n'.join() dies with an
                # opaque TypeError mid-partition AFTER earlier payloads
                # already POSTed
                raise ValueError(
                    f"index action for doc_id={r['doc_id']!r} "
                    f"index={r['index']!r} has NULL source — a document "
                    f"body is required (use a delete action to remove)"
                )
            yield r["source"]
        elif r["action"] == "script_update":
            if r["source"] is None:
                # same explicit failure as the index arm: json.loads(None)
                # is an opaque TypeError mid-partition after earlier
                # payloads already POSTed
                raise ValueError(
                    f"script_update action for doc_id={r['doc_id']!r} "
                    f"index={r['index']!r} has NULL source — a script "
                    f"body is required"
                )
            # scripted_upsert:true — reference bulk/bulk.go:230-239
            try:
                body = json.loads(r["source"])
            except ValueError as e:
                # same doc-addressed failure contract as the NULL guards
                # above: a malformed script body otherwise dies as a bare
                # JSONDecodeError mid-partition with no way to find the row
                raise ValueError(
                    f"script_update action for doc_id={r['doc_id']!r} "
                    f"index={r['index']!r} has a non-JSON script body: {e}"
                ) from e
            yield json.dumps(
                {"script": body, "scripted_upsert": True}, separators=(",", ":")
            )


def bulk_payloads(
    rows: Iterable[dict],
    batch_size_limit: int = DEFAULT_BATCH_SIZE_LIMIT,
    batch_byte_size_limit: int = DEFAULT_BATCH_BYTE_SIZE_LIMIT,
    type_name: str | None = None,
) -> Iterator[bytes]:
    """Group framed actions into bulk request payloads honoring the
    reference's count AND byte flush triggers (bulk/bulk.go:164).

    The byte trigger flushes BEFORE appending the action that would cross
    the limit, so every emitted payload stays within
    ``batch_byte_size_limit`` (a deployment tunes it to the cluster's
    http.max_content_length; the old append-then-check shipped one
    oversized request and ES rejected it with a fatal 413 — review r7).
    A single action larger than the limit still ships alone: it cannot be
    split, and the server's verdict on it is the only truth available."""
    buf: list[str] = []
    n_actions = 0
    n_bytes = 0
    for r in rows:
        lines = list(frame_actions([r], type_name))
        add = sum(len(line.encode()) + 1 for line in lines)
        if buf and n_bytes + add > batch_byte_size_limit:
            yield ("\n".join(buf) + "\n").encode()
            buf, n_actions, n_bytes = [], 0, 0
        buf.extend(lines)
        n_actions += 1
        n_bytes += add
        if n_actions >= batch_size_limit or n_bytes >= batch_byte_size_limit:
            yield ("\n".join(buf) + "\n").encode()
            buf, n_actions, n_bytes = [], 0, 0
    if buf:
        yield ("\n".join(buf) + "\n").encode()


def parse_bulk_response(response_body: str) -> tuple[list[dict], list[dict]]:
    """Split a bulk response into (successes, errors) keyed per item —
    reference hasResponseError/joinErrors (bulk/bulk.go:321-378).
    Each returned dict carries _id, _index, status, error."""
    body = json.loads(response_body)
    if not isinstance(body, dict) or "items" not in body:
        # every POSTed payload carries >= 1 action, so a real bulk API
        # response ALWAYS has an items array — a body without one is not
        # a bulk response at all (transport pointed at a non-ES service,
        # a proxy/LB error page served as 200 JSON, a top-level error
        # shape). Treating it as zero-item success acked the batch and
        # lost every document in it.
        raise ValueError(
            f"not a bulk API response (no 'items'): {response_body[:300]!r}"
        )
    oks: list[dict] = []
    errs: list[dict] = []
    for item in body["items"]:
        (verb, info), = item.items()
        rec = {
            "_id": info.get("_id"),
            "_index": info.get("_index"),
            "status": info.get("status"),
            "error": info.get("error"),
            "verb": verb,
        }
        (errs if info.get("error") else oks).append(rec)
    return oks, errs


def write_bulk(
    actions: DataFrame,
    transport: Callable[[bytes], str],
    batch_size_limit: int = DEFAULT_BATCH_SIZE_LIMIT,
    batch_byte_size_limit: int = DEFAULT_BATCH_BYTE_SIZE_LIMIT,
    concurrent_requests: int | None = None,
    on_error: str = "fail",
    type_name: str | None = None,
    es_version: str | None = None,
) -> None:
    """Execute the write plan against a transport.

    ``transport(payload) -> response_body`` is one bulk HTTP call; tests
    inject a recorder, live mode would wrap urllib against real ES.
    ``concurrent_requests`` maps to partition width (reference
    ``elasticsearch.concurrentRequest``, fan-out at bulk/bulk.go:297-315).
    ``on_error='fail'`` reproduces the no-response-handler contract (panic
    before ack => batch retried, bulk/bulk.go:256-259); ``'continue'``
    reproduces the handler contract (per-item dispatch, R13).
    """
    if on_error not in ("fail", "continue"):
        # unvalidated, 'Fail'/'raise'/any typo silently behaved as
        # 'continue' — rejected items dropped with no exception and the
        # batch checkpoint-acked (silent data loss)
        raise ValueError(
            f"write_bulk: on_error must be 'fail' or 'continue', "
            f"got {on_error!r}"
        )
    if concurrent_requests is not None:
        actions = actions.repartition(concurrent_requests)
    effective_type = resolve_type_name(type_name, es_version)

    def run_partition(rows):
        dispatch_bulk_rows(
            (row.asDict() for row in rows),
            transport,
            batch_size_limit,
            batch_byte_size_limit,
            effective_type,
            on_error,
        )

    actions.foreachPartition(run_partition)


def dispatch_bulk_rows(
    rows: Iterable[dict],
    transport: Callable[[bytes], str],
    batch_size_limit: int,
    batch_byte_size_limit: int,
    type_name: str | None,
    on_error: str,
) -> None:
    """One partition's worth of write_bulk: frame, POST, enforce the error
    contract. Module-level (not a closure) so the per-item error handling
    is directly unit-testable — foreachPartition bodies run in worker
    processes where a test can't observe logging."""
    for payload in bulk_payloads(
        rows, batch_size_limit, batch_byte_size_limit, type_name
    ):
        body = transport(payload)
        _, errs = parse_bulk_response(body)
        if errs:
            if on_error == "fail":
                raise RuntimeError(
                    f"bulk request had {len(errs)} item errors: {errs[:3]}"
                )
            # 'continue' drops the items by contract (the caller chose
            # fire-and-forget over write_bulk_results/DLQ) — but a
            # SILENT drop left zero trace of lost documents anywhere;
            # at minimum the executor log must say what and how many
            import logging

            logging.getLogger(__name__).warning(
                "bulk write dropped %d rejected items "
                "(on_error='continue'; use write_bulk_with_dlq to "
                "capture them): first=%s",
                len(errs),
                errs[0],
            )


def _basic_auth_header(username: str, password: str | None) -> str:
    import base64

    token = base64.b64encode(f"{username}:{password or ''}".encode()).decode()
    return f"Basic {token}"


import itertools as _itertools
import os as _os

# per-PROCESS healthy-path rotation state for http_transport (see its
# docstring): module globals are rebuilt in every Python worker, unlike
# closure-captured state which pickling freezes
_RR_COUNTER = _itertools.count()


def _next_rr() -> int:
    return _os.getpid() + next(_RR_COUNTER)


def _url_list(base_url) -> tuple[str, ...]:
    """Normalize the single-url and node-list forms: the reference's
    config takes ``elasticsearch.urls`` as []string and its transport
    load-balances across the nodes (config/config.go:13,
    README.md:233-242)."""
    if isinstance(base_url, str):
        return (base_url,)
    urls = tuple(base_url)
    if not urls:
        raise ValueError("at least one Elasticsearch url is required")
    return urls


def http_transport(
    base_url,
    username: str | None = None,
    password: str | None = None,
    timeout_sec: float = 30.0,
    max_retries: int = 5,
    compress: bool = False,
) -> Callable[[bytes], str]:
    """Real HTTP transport for the bulk endpoint (POST {base}/_bulk,
    content-type application/x-ndjson) with basic auth + bounded retries —
    the reference's client behavior (elasticsearch/client/client.go:12-49:
    5 retries; fasthttp_transport.go:62-65 always POSTs). ``compress``
    gzips the request body (Content-Encoding: gzip) like the reference's
    ``elasticsearch.compressionEnabled``. Returns a callable usable by
    write_bulk / write_bulk_with_dlq on executors.

    ``base_url`` may be one url or the reference's node LIST
    (config/config.go:13 ``Urls []string``): calls round-robin across the
    nodes, and each retry ATTEMPT rotates to the next one — a dead node
    costs one connect failure, not the whole batch (r11, VERDICT r10
    item 2). Deterministic 4xx still fails immediately: every node would
    reject the same malformed payload the same way.

    The rotation start comes from a MODULE-LEVEL per-process counter
    offset by the pid (``_next_rr``), not a counter captured in this
    closure: the closure ships to executors by pickle, and a captured
    ``itertools.count`` froze at its pickle-time value in every task —
    all healthy-path traffic landed on ``urls[0]`` across the cluster
    (review r11). Module state is rebuilt per Python worker, so calls
    within a worker rotate and distinct workers start on distinct nodes
    via the pid offset."""
    urls = _url_list(base_url)

    def transport(payload: bytes) -> str:
        import gzip as _gzip
        import time as _time
        import urllib.error
        import urllib.request

        headers = {"Content-Type": "application/x-ndjson"}
        if compress:
            payload = _gzip.compress(payload)
            headers["Content-Encoding"] = "gzip"
        start = _next_rr()
        last_err: Exception | None = None
        for attempt in range(max_retries):
            url = urls[(start + attempt) % len(urls)]
            req = urllib.request.Request(
                url.rstrip("/") + "/_bulk",
                data=payload,
                method="POST",
                headers=headers,
            )
            if username is not None:
                req.add_header(
                    "Authorization", _basic_auth_header(username, password)
                )
            try:
                with urllib.request.urlopen(req, timeout=timeout_sec) as resp:
                    return resp.read().decode()
            except urllib.error.HTTPError as e:
                # HTTPError subclasses URLError: without this arm every
                # deterministic 4xx (400 malformed NDJSON, 413 too large)
                # was blindly re-POSTed max_retries times and the ES
                # error body — the part saying WHICH line failed — was
                # discarded. Retry only what can heal (429 backpressure,
                # 5xx); fail 4xx immediately with the body attached.
                try:
                    detail = e.read().decode(errors="replace")[:2000]
                except Exception:  # noqa: BLE001
                    detail = ""
                if e.code != 429 and e.code < 500:
                    raise RuntimeError(
                        f"bulk request rejected (HTTP {e.code}): {detail}"
                    ) from e
                last_err = RuntimeError(f"HTTP {e.code} from {url}: {detail}")
            except (urllib.error.URLError, OSError) as e:
                last_err = RuntimeError(f"{url}: {e}")
            if attempt < max_retries - 1:  # no pointless final-attempt sleep
                # fail over to an UNTRIED node immediately — backoff is for
                # a struggling cluster, not for switching to a different
                # healthy node; once every node has been tried, back off
                if attempt >= len(urls) - 1:
                    _time.sleep(min(0.1 * 2**attempt, 2.0))
        raise RuntimeError(f"bulk request failed after {max_retries} retries: {last_err}")

    return transport


def http_info_transport(
    base_url,
    username: str | None = None,
    password: str | None = None,
    timeout_sec: float = 10.0,
) -> Callable[[], str]:
    """Info API call (GET {base}/) for detect_es_version — the reference's
    client.Info() (client/client.go:52-56). ``base_url`` may be a node
    list: each url is tried in order and the first live node answers —
    version detection must not fail because node 1 is down (r11)."""
    urls = _url_list(base_url)

    def info() -> str:
        import urllib.error
        import urllib.request

        last_err: Exception | None = None
        for url in urls:
            req = urllib.request.Request(url.rstrip("/") + "/", method="GET")
            if username is not None:
                req.add_header(
                    "Authorization", _basic_auth_header(username, password)
                )
            try:
                with urllib.request.urlopen(req, timeout=timeout_sec) as resp:
                    return resp.read().decode()
            except urllib.error.HTTPError as e:
                # HTTPError subclasses URLError: without this arm a
                # deterministic 4xx (401 wrong password, 403) was probed
                # against every node and surfaced as a misleading
                # 'no node answered' — same fail-fast discipline as
                # http_transport; 429/5xx count as node trouble and the
                # next node gets its chance (review r11)
                if e.code != 429 and e.code < 500:
                    try:
                        detail = e.read().decode(errors="replace")[:500]
                    except Exception:  # noqa: BLE001
                        detail = ""
                    raise RuntimeError(
                        f"info request rejected (HTTP {e.code}): {detail}"
                    ) from e
                last_err = e
            except (urllib.error.URLError, OSError) as e:
                last_err = e
        raise RuntimeError(
            f"no Elasticsearch node answered the info request "
            f"(tried {len(urls)}): {last_err}"
        )

    return info


def write_bulk_results(
    actions: DataFrame,
    transport: Callable[[bytes], str],
    batch_size_limit: int = DEFAULT_BATCH_SIZE_LIMIT,
    batch_byte_size_limit: int = DEFAULT_BATCH_BYTE_SIZE_LIMIT,
    type_name: str | None = None,
    es_version: str | None = None,
) -> DataFrame:
    """Response-handler mode (reference R13): execute the write plan and
    RETURN one record per item — mirrors handleResponse
    (bulk/bulk.go:392-411) dispatching OnSuccess for acked items and
    OnError for failed ones (elasticsearch/response_handler.go:8-23).
    ``ok=true`` rows are the OnSuccess stream (error null), ``ok=false``
    rows the OnError stream; filter for either side.

    The returned frame is EAGERLY materialized (localCheckpoint): the bulk
    POSTs are side effects, and a lazy plan would re-send every request on
    each action over the result (a second count(), an AQE stage retry,
    cache eviction) — double-applying non-idempotent script updates."""
    effective_type = resolve_type_name(type_name, es_version)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = pdf.to_dict("records")
            results = []
            for payload in bulk_payloads(
                rows, batch_size_limit, batch_byte_size_limit, effective_type
            ):
                body = transport(payload)
                oks, errs = parse_bulk_response(body)
                for o in oks:
                    results.append(
                        {
                            "doc_id": o["_id"],
                            "index": o["_index"],
                            "status": int(o["status"] or 0),
                            "error": None,
                            "ok": True,
                        }
                    )
                for e in errs:
                    results.append(
                        {
                            "doc_id": e["_id"],
                            "index": e["_index"],
                            "status": int(e["status"] or 0),
                            # ALWAYS json.dumps (review r6): older-ES /
                            # proxy responses carry item errors as plain
                            # strings — encoding only the dict case left
                            # the persisted DLQ column a mix of raw
                            # strings and JSON that json.loads chokes on.
                            # Strings become quoted JSON; the column is
                            # uniformly machine-readable.
                            "error": json.dumps(e["error"])
                            if e["error"] is not None
                            else None,
                            "ok": False,
                        }
                    )
            yield pd.DataFrame(
                results, columns=["doc_id", "index", "status", "error", "ok"]
            )

    return actions.mapInPandas(
        run, schema="doc_id string, index string, status int, error string, ok boolean"
    ).localCheckpoint()


def write_bulk_with_dlq(
    actions: DataFrame,
    transport: Callable[[bytes], str],
    batch_size_limit: int = DEFAULT_BATCH_SIZE_LIMIT,
    batch_byte_size_limit: int = DEFAULT_BATCH_BYTE_SIZE_LIMIT,
    type_name: str | None = None,
    es_version: str | None = None,
) -> DataFrame:
    """The OnError side of write_bulk_results — the dead-letter queue the
    caller persists (same schema as before: doc_id, index, status, error)."""
    return (
        write_bulk_results(
            actions,
            transport,
            batch_size_limit,
            batch_byte_size_limit,
            type_name,
            es_version,
        )
        .filter(~F_col("ok"))
        .drop("ok")
    )
