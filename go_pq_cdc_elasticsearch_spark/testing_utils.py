"""Shared oracle-comparison helpers (used by tests and tools/check.py).

Mirrors the driver's check: row count + column names + order-insensitive
value hash with doubles rounded to 6 decimals.
"""

from __future__ import annotations

import math

import duckdb

from go_pq_cdc_elasticsearch_spark.catalog import TABLES, table_path


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # + 0.0 maps -0.0 to 0.0: engines disagreeing only in the SIGN of
        # a zero at 6 decimals (cross-engine sum-order noise around 0, or
        # an exact -0.0 product) formatted as '-0.000000' vs '0.000000' —
        # a false mismatch for values equal at the declared tolerance
        # (review r7)
        return f"{round(v, 6) + 0.0:.6f}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_rows(cols, rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "\x01".join(canon_value(r[i]) for i in order) for r in rows
    )


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def compare_rows(scols, srows, ocols, orows) -> list[str]:
    """THE comparison triplet (columns, rowcount, canonical values) —
    the single implementation both compare() and tools/check.py use;
    a second copy had already drifted once (review r5, again r7)."""
    problems = []
    if sorted(scols) != sorted(ocols):
        problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
    if not problems:
        sc = canon_rows(scols, srows)
        oc = canon_rows(ocols, orows)
        if sc != oc:
            diffs = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
            problems.append(f"values differ: {diffs}")
    return problems


def compare(spark_df, con, oracle: str) -> list[str]:
    """Return a list of problems (empty == match)."""
    scols = list(spark_df.columns)
    srows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    return compare_rows(scols, srows, ocols, orows)


class FakeReplicationServer:
    """Scripted stand-in for a Postgres replication endpoint, speaking the
    real wire frames (sources/pgoutput.py) over TCP: answers slot create,
    streams the scripted `transactions` (lists of (lsn, pgoutput-payload)
    pairs) as XLogData, interleaves reply-requested keepalives, records
    every StandbyStatusUpdate in ``acks``. Used by tests and examples; a
    real server is a drop-in."""

    def __init__(
        self,
        transactions,
        keepalive_each_txn: bool = True,
        max_connections: int = 1,
    ):
        import socket
        import threading

        from go_pq_cdc_elasticsearch_spark.sources import pgoutput as PG

        self._PG = PG
        self.transactions = transactions
        self.keepalive_each_txn = keepalive_each_txn
        self.max_connections = max_connections
        self.acks: list[dict] = []
        self.slots: list[str] = []
        self.copy_done_replies = 0  # client CopyDone answers (graceful end)
        self.startups: list[dict] = []
        self.start_queries: list[str] = []  # raw START_REPLICATION commands
        self.server = socket.create_server(("127.0.0.1", 0))
        self.port = self.server.getsockname()[1]
        self.done = threading.Event()
        threading.Thread(target=self._serve, daemon=True).start()

    def _serve(self):
        PG = self._PG
        for _ in range(self.max_connections):
            try:
                conn, _addr = self.server.accept()
            except OSError:
                break
            f = conn.makefile("rwb")
            try:
                self._handle(f)
            except (OSError, ValueError):
                pass
        # set AFTER the accept loop: with max_connections > 1, signalling
        # in the per-connection finally reported "server finished" as soon
        # as the FIRST connection closed, while a reconnect test's second
        # stream was still in flight (review r7)
        self.done.set()

    def _maybe_handle_startup(self, f, first: bytes) -> bytes:
        """Speak the real connection handshake: the first packet on a fresh
        connection is the UNTYPED StartupMessage (its first byte is 0x00 —
        a length prefix — never an ASCII frame type). Replies
        AuthenticationOk + ParameterStatus + ReadyForQuery, like a
        trust-auth walsender. Returns the next frame's type byte (b'' on
        EOF) so _handle continues uniformly; a legacy client that skips
        startup still works (its first byte is a typed frame)."""
        import struct

        PG = self._PG
        if first != b"\x00":
            return first
        rest = f.read(3)
        (n,) = struct.unpack("!I", first + rest)
        body = f.read(n - 4)
        params = body[4:].rstrip(b"\x00").split(b"\x00")
        self.startups.append(
            dict(zip([p.decode() for p in params[0::2]],
                     [p.decode() for p in params[1::2]]))
        )
        f.write(PG.frame(b"R", struct.pack("!I", 0)))  # AuthenticationOk
        f.write(PG.frame(b"S", b"server_version\x0016.3\x00"))
        f.write(PG.frame(b"Z", b"I"))
        f.flush()
        nxt = f.read(1)
        return nxt if nxt else b""

    def _handle(self, f):
        PG = self._PG
        first = f.read(1)
        t0 = self._maybe_handle_startup(f, first)
        pending = t0
        while True:
            if pending:
                t = pending
                pending = None
                import struct

                (n,) = struct.unpack("!I", f.read(4))
                body = f.read(n - 4)
            else:
                t, body = PG.read_frame(f)
            if not t:
                return
            if t == b"Q":
                sql = body.rstrip(b"\x00").decode()
                if sql.startswith("CREATE_REPLICATION_SLOT"):
                    # realistic reply: a ONE-ROW RESULT SET, not a bare
                    # CommandComplete — RowDescription/DataRow/
                    # CommandComplete/ReadyForQuery (duplicate slot: an
                    # ErrorResponse 42710 then ReadyForQuery)
                    slot = sql.split()[1]
                    if slot in self.slots:
                        f.write(
                            PG.frame(
                                b"E",
                                b"SERROR\x00C42710\x00"
                                b"Mreplication slot already exists\x00\x00",
                            )
                        )
                        f.write(PG.frame(b"Z", b"I"))
                        f.flush()
                        continue
                    self.slots.append(slot)
                    f.write(
                        PG.frame(
                            b"T",
                            b"\x00\x01slot_name\x00"
                            + b"\x00" * 18,  # minimal single-col descriptor
                        )
                    )
                    f.write(
                        PG.frame(
                            b"D",
                            b"\x00\x01"
                            + len(slot).to_bytes(4, "big")
                            + slot.encode(),
                        )
                    )
                    f.write(PG.frame(b"C", b"CREATE_REPLICATION_SLOT\x00"))
                    f.write(PG.frame(b"Z", b"I"))
                    f.flush()
                elif sql.startswith("CREATE PUBLICATION"):
                    # the docstring's drop-in claim covers
                    # publication.createIfNotExists: a client with
                    # create_publication=True previously hung forever
                    # draining to a ReadyForQuery that never came
                    # (review r7)
                    f.write(PG.frame(b"C", b"CREATE PUBLICATION\x00"))
                    f.write(PG.frame(b"Z", b"I"))
                    f.flush()
                elif sql.startswith("START_REPLICATION"):
                    self.start_queries.append(sql)
                    # resume contract: logical replication re-delivers WHOLE
                    # transactions not yet confirmed — skip txns whose final
                    # (commit) lsn is <= the requested start, resend the rest
                    # entirely (relation messages included, like Postgres
                    # re-announces relations per connection)
                    hi, lo = sql.split(" LOGICAL ")[1].split(" ")[0].split("/")
                    start_lsn = (int(hi, 16) << 32) | int(lo, 16)
                    f.write(PG.copy_both_response())
                    f.flush()
                    self._stream(f, start_lsn)
                else:
                    # any other simple query: minimal CommandComplete +
                    # ReadyForQuery so _run_simple_query can drain (a
                    # silent fall-through blocked the client forever)
                    f.write(PG.frame(b"C", b"OK\x00"))
                    f.write(PG.frame(b"Z", b"I"))
                    f.flush()
            elif t == b"d" and body[:1] == b"r":
                self.acks.append(PG.parse_standby_status(body))
            elif t == b"c":
                # the client's CopyDone reply — a real walsender waits for
                # this before CommandComplete on a graceful stream end
                self.copy_done_replies += 1

    def _stream(self, f, start_lsn: int = 0):
        PG = self._PG
        for txn in self.transactions:
            if txn and txn[-1][0] <= start_lsn:
                continue  # already confirmed past this txn's commit
            for lsn, payload in txn:
                f.write(PG.copy_data(PG.xlog_data(lsn, lsn, 0, payload)))
            if self.keepalive_each_txn and txn:
                f.write(PG.copy_data(PG.keepalive(txn[-1][0], 0, True)))
                f.flush()
                t, body = PG.read_frame(f)
                if t == b"d" and body[:1] == b"r":
                    self.acks.append(PG.parse_standby_status(body))
            else:
                f.flush()
        # CopyDone is a TOP-LEVEL frame on the real wire (WalSndDone), not
        # a CopyData payload — the server then waits for the client's
        # CopyDone reply before CommandComplete (review r6: the old
        # in-CopyData form exercised a dead client branch and hid that the
        # client never answered a real graceful end-of-stream)
        f.write(PG.frame(b"c", b""))
        f.flush()
