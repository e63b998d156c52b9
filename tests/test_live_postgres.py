"""Live-PostgreSQL integration: the real pgoutput encoder end to end
(reference integration_test/connector_test.go:25-146 is the mirrored
contract — table, publication, slot, DML round-trip, ack progression).

The FakeReplicationServer fuzz tests cover FRAMING; this module is the one
place the consumer talks to a genuine walsender: a throwaway initdb'd
server (wal_level=logical) under /tmp, running as the ``postgres`` system
user, trust auth, torn down after the module.

DEFAULT-ON: the fixture auto-detects the postgres binaries and skips only
when they are absent or initdb/pg_ctl genuinely fail (e.g. no ``postgres``
system user), so on a provisioned box the real-walsender proof is standing,
not opt-in. Set SPARK_GRAFT_LIVE_PG=0 to force-skip (e.g. a constrained CI
box where server startup is known-flaky).
"""

import os
import shutil
import socket
import subprocess
import tempfile
import time

import pytest

from go_pq_cdc_elasticsearch_spark.sources import pgoutput as PG

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_LIVE_PG") == "0",
    reason="live Postgres integration force-skipped via SPARK_GRAFT_LIVE_PG=0",
)

PORT = 55439  # rebound to a free port by the fixture (default-on robustness)


def _discover_pg_majors() -> list:
    """Every distinct PostgreSQL major installed on this host, as
    ``(major, bindir)`` — the live suite parametrizes over ALL of them
    (r11, VERDICT r10 item 3: the reference CI proves 4 PG versions,
    integration_test.yml:18-21; the protocol surface — pgoutput v2,
    SCRAM, TLS — is exactly where cross-version drift would bite).
    Debian (/usr/lib/postgresql/<major>/bin), RHEL (/usr/pgsql-<ver>/bin)
    and PATH layouts are probed; duplicates of the same major collapse
    (first hit wins). On a single-version host this is a 1-element matrix
    — the limitation is documented in COVERAGE.md."""
    import glob
    import re

    candidates: list[str] = []
    for pat in ("/usr/lib/postgresql/*/bin", "/usr/pgsql-*/bin"):
        candidates.extend(sorted(glob.glob(pat)))
    path_initdb = shutil.which("initdb")
    if path_initdb:
        candidates.append(os.path.dirname(path_initdb))
    found: dict[str, str] = {}
    for bindir in candidates:
        pg_bin = os.path.join(bindir, "postgres")
        if not (
            os.path.exists(os.path.join(bindir, "initdb"))
            and os.path.exists(pg_bin)
        ):
            continue
        try:
            out = subprocess.run(
                [pg_bin, "--version"], capture_output=True, text=True, timeout=20
            ).stdout
        except (OSError, subprocess.TimeoutExpired):
            continue
        m = re.search(r"PostgreSQL\)?\s+(\d+)", out)
        if m:
            found.setdefault(m.group(1), bindir)
    return sorted(found.items(), key=lambda kv: int(kv[0]))


_PG_MATRIX = _discover_pg_majors()
# bindir of the matrix entry currently under test; _su() prepends it to
# PATH so every psql/initdb/pg_ctl in the module binds to that major
_PG_BINDIR = _PG_MATRIX[-1][1] if _PG_MATRIX else ""


def _free_port() -> int:
    # a fixed port would skip the whole module if a stale server (or any
    # other process) is listening; bind-to-0 gets a genuinely free one
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _lsn_int(text: str) -> int:
    """pg textual LSN ('1/9A3F0D28') -> 64-bit int."""
    hi, lo = text.split("/")
    return (int(hi, 16) << 32) | int(lo, 16)


def _su(cmd: str, timeout: int = 120) -> subprocess.CompletedProcess:
    # the repo dir is unreadable by the postgres system user; run from /tmp.
    # PATH pins the binaries to the PG major under test (version matrix)
    prefix = f"export PATH={_PG_BINDIR}:$PATH && " if _PG_BINDIR else ""
    return subprocess.run(
        ["su", "-s", "/bin/bash", "postgres", "-c", f"cd /tmp && {prefix}{cmd}"],
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.fixture(
    scope="module",
    params=_PG_MATRIX or [("none", "")],
    ids=lambda p: f"pg{p[0]}",
)
def pg(request):
    """One throwaway server per discovered PostgreSQL MAJOR: the whole
    module (pgoutput v1+v2, SCRAM, TLS, chaos soak, standby takeover)
    re-runs against each entry of the host's version matrix."""
    major, bindir = request.param
    if not bindir:
        pytest.skip("postgres binaries not installed")
    global PORT, _PG_BINDIR
    _PG_BINDIR = bindir
    if not shutil.which("psql", path=f"{bindir}:{os.environ.get('PATH', '')}"):
        pytest.skip(f"psql not found for PG {major}")
    PORT = _free_port()
    work = tempfile.mkdtemp(prefix="pg_live_")
    os.chmod(work, 0o777)
    data = os.path.join(work, "data")
    r = _su(f"initdb -D {data} --auth=trust -U postgres")
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-300:]}")
    with open(os.path.join(data, "postgresql.conf"), "a") as f:
        f.write(
            # one slot per test (slots are never dropped mid-module so each
            # test's WAL window stays inspectable); keep headroom above the
            # current test count or create_slot fails module-late with
            # "all replication slots are in use"
            "\nwal_level=logical\nmax_replication_slots=32\nmax_wal_senders=32\n"
            f"port={PORT}\nlisten_addresses='127.0.0.1'\n"
            f"unix_socket_directories='{work}'\nlogging_collector=off\n"
            # keepalives every ~timeout/2 (~5 s) instead of the 30 s
            # default: the idle-frontier ack path (keepalive-carried
            # sentPtr on a stream whose traffic is all filtered out) must
            # be observable on test timescales. Also makes a dead client
            # detectable fast; a live consumer doesn't trip it because
            # run_live_consumer sends an unconditional status heartbeat
            # every ack sweep (1 s), even mid-redelivery-backlog.
            "wal_sender_timeout='10s'\n"
        )
    r = _su(f"pg_ctl -D {data} -l {work}/server.log -w start")
    if r.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")

    def sql(q: str, db: str = "postgres") -> str:
        q = q.replace('"', '\\"')
        rr = _su(
            f'psql -h 127.0.0.1 -p {PORT} -U postgres -d {db} '
            f'-v ON_ERROR_STOP=1 -Atc "{q}"'
        )
        assert rr.returncode == 0, f"psql failed: {rr.stderr}"
        return rr.stdout.strip()

    sql("CREATE DATABASE cdc_db")
    # the reference's users table (connector_test.go:33-41), REPLICA
    # IDENTITY FULL so update/delete carry before-images
    sql(
        "CREATE TABLE users (id serial PRIMARY KEY, name text NOT NULL, email text)",
        db="cdc_db",
    )
    sql("ALTER TABLE users REPLICA IDENTITY FULL", db="cdc_db")
    sql("CREATE PUBLICATION cdc_pub FOR TABLE users", db="cdc_db")
    yield {"sql": sql, "work": work}
    _su(f"pg_ctl -D {data} -m immediate stop")
    shutil.rmtree(work, ignore_errors=True)


def _connect(slot: str, proto_version: int = 1) -> PG.ReplicationClient:
    sock = socket.create_connection(("127.0.0.1", PORT), timeout=30)
    sock.settimeout(30)  # a hung read fails the test instead of the session
    client = PG.ReplicationClient(
        sock, slot=slot, publication="cdc_pub", proto_version=proto_version
    )
    client.startup(user="postgres", database="cdc_db")
    return client


def _collect(client: PG.ReplicationClient, n: int, deadline_sec: float = 30.0):
    got = []
    end = time.time() + deadline_sec
    for change in client.poll(heartbeat=True):
        if change is not None:
            got.append(change)
        if len(got) >= n or time.time() > end:
            break
    return got


def _view_state(c) -> "dict | None":
    """One polling read of a live Connector's view, or None when the read
    landed in a transient not-ready window so the caller's deadline loop
    just retries: (a) view not initialized yet (Python FileNotFoundError),
    (b) the documented read-during-swap window — the per-bucket two-rename
    swap (sink/materialized.py module doc) can make a concurrently-planned
    scan lose its listed file, surfacing as a Py4J-wrapped
    java.io.FileNotFoundException mid-collect."""
    try:
        return {r["id"]: r["payload"]["v"] for r in c.read().collect()}
    except FileNotFoundError:
        return None
    except Exception as e:  # noqa: BLE001 — inspect, rethrow non-transient
        msg = str(e)
        if "FileNotFoundException" in msg or "PATH_NOT_FOUND" in msg:
            return None
        raise


def test_live_insert_update_delete_roundtrip(pg):
    client = _connect("live_slot_rt")
    client.create_slot()
    client.start()
    pg["sql"](
        "INSERT INTO users (name, email) VALUES ('alice', 'a@example.com')",
        db="cdc_db",
    )
    pg["sql"](
        "UPDATE users SET email = 'a2@example.com' WHERE name = 'alice'",
        db="cdc_db",
    )
    pg["sql"]("DELETE FROM users WHERE name = 'alice'", db="cdc_db")
    try:
        got = _collect(client, 3)
        assert [c["op"] for c in got] == ["INSERT", "UPDATE", "DELETE"]
        ins, upd, dele = got
        assert ins["table_schema"] == "public" and ins["table_name"] == "users"
        assert ins["after"]["name"] == "alice"
        assert ins["after"]["email"] == "a@example.com"
        assert ins["before"] is None
        # REPLICA IDENTITY FULL: real before-images from a real encoder
        assert upd["before"]["email"] == "a@example.com"
        assert upd["after"]["email"] == "a2@example.com"
        assert dele["before"]["name"] == "alice" and dele["after"] is None
        assert all(c["lsn"] > 0 for c in got)
        assert all(c["ts"].startswith("20") for c in got)  # real commit ts
    finally:
        client.close()


def test_live_ack_advances_slot_and_resume_skips_redelivery(pg):
    client = _connect("live_slot_ack")
    client.create_slot()
    client.start()
    pg["sql"](
        "INSERT INTO users (name, email) VALUES ('bob', 'b@example.com')",
        db="cdc_db",
    )
    got = _collect(client, 1)
    assert got and got[0]["after"]["name"] == "bob"
    # R12 contract: the StandbyStatusUpdate moves the slot's confirmed
    # flush position on the SERVER. Two real-server subtleties this test
    # documents: (a) confirmed_flush_lsn is non-zero right after
    # CREATE_REPLICATION_SLOT, so "non-zero" is NOT evidence the ack
    # landed — compare to the acked position itself; (b) breaking out of
    # poll() right after the INSERT leaves the Commit frame unread, so
    # client.last_wal_end is MID-transaction — acking it does not skip
    # the txn on redelivery (logical decoding resends any transaction
    # whose commit is above confirmed_flush: genuine at-least-once).
    # Ack a position past the commit record (the server's current WAL),
    # exactly what the production consumer does after a full flush.
    cur = pg["sql"]("SELECT pg_current_wal_lsn()", db="cdc_db")
    target = _lsn_int(cur)
    client.ack(target)
    flushed_int = 0
    for _ in range(100):
        flushed = pg["sql"](
            "SELECT confirmed_flush_lsn FROM pg_replication_slots "
            "WHERE slot_name = 'live_slot_ack'"
        )
        if flushed:
            flushed_int = _lsn_int(flushed)
            if flushed_int >= target:
                break
        time.sleep(0.2)
    client.close()
    assert flushed_int >= target >= got[0]["lsn"]

    # resume from the confirmed position: bob must NOT be redelivered
    client2 = _connect("live_slot_ack")
    client2.start(start_lsn=flushed_int)
    pg["sql"](
        "INSERT INTO users (name, email) VALUES ('carol', 'c@example.com')",
        db="cdc_db",
    )
    try:
        got2 = _collect(client2, 1)
        assert got2 and got2[0]["after"]["name"] == "carol"
    finally:
        client2.close()


def test_live_consumer_to_spark_view(pg, spark):
    """The full production path against the real encoder: walsender ->
    run_live_consumer -> wal segment files -> pgwal Spark source ->
    keyed materialized view (the same chain test_wal_source drives from
    synthetic segments)."""
    import threading

    from go_pq_cdc_elasticsearch_spark.sink.materialized import MaterializedView
    from go_pq_cdc_elasticsearch_spark.sources import wal as W

    client = _connect("live_slot_e2e")
    client.create_slot()
    client.start()
    work = tempfile.mkdtemp(prefix="live_e2e_")
    seg_dir = os.path.join(work, "wal")
    stop = threading.Event()
    t = threading.Thread(
        target=PG.run_live_consumer,
        args=(client, seg_dir),
        kwargs={"batch_size": 2, "flush_interval_sec": 0.5, "stop_event": stop},
        daemon=True,
    )
    t.start()
    for i in range(5):
        pg["sql"](
            f"INSERT INTO users (name, email) VALUES ('u{i}', 'u{i}@example.com')",
            db="cdc_db",
        )
    deadline = time.time() + 30
    while time.time() < deadline:
        if os.path.isdir(seg_dir) and any(
            f.startswith("wal_") and f.endswith(".ndjson")
            for f in os.listdir(seg_dir)
        ):
            time.sleep(1.0)  # allow the tail flush
            break
        time.sleep(0.2)
    stop.set()
    t.join(timeout=30)
    client.close()

    W.register(spark)
    stream = spark.readStream.format("pgwal").option("path", seg_dir).load()
    view = MaterializedView(
        spark,
        os.path.join(work, "view"),
        keys=("key",),
        seq_col="lsn",
        op_col="op",
        delete_op="DELETE",
    )
    from pyspark.sql import functions as F

    shaped = stream.select(
        "lsn",
        "op",
        F.coalesce(F.col("after"), F.col("before")).getItem("name").alias("key"),
        F.coalesce(F.col("after"), F.col("before")).getItem("email").alias("email"),
    )
    q = (
        shaped.writeStream.foreachBatch(view.foreach_batch_writer())
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = {r["key"]: r["email"] for r in view.read().collect()}
    for i in range(5):
        assert state.get(f"u{i}") == f"u{i}@example.com"


def test_live_interleaved_transactions_commit_order_and_monotone_stamps(pg):
    """Two REAL concurrent sessions interleave: session 1 BEGINs and writes
    a row (low WAL position), session 2 then writes AND commits (higher
    positions, earlier commit), session 1 commits last. Logical decoding
    delivers in COMMIT order, so the later-delivered txn carries LOWER
    per-row wal_start positions — exactly the shape that, unclamped, was
    stamped below the stream frontier and silently dropped (review
    finding, round 5). Proves on a real walsender: delivery is commit-
    ordered, stamps stay strictly monotone, and txn_bounds carry
    increasing commit ends."""
    import subprocess

    client = _connect("live_slot_interleave")
    client.create_slot()
    client.start()

    # session 1: open txn, write, DON'T commit yet
    s1 = subprocess.Popen(
        ["su", "-s", "/bin/bash", "postgres", "-c",
         f"cd /tmp && psql -h 127.0.0.1 -p {PORT} -U postgres -d cdc_db "
         f"-v ON_ERROR_STOP=1"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True,
    )
    s1.stdin.write(
        "BEGIN;\nINSERT INTO users (name, email) VALUES ('tx1', '1@x');\n"
    )
    s1.stdin.flush()
    # make sure s1's INSERT hit the WAL before s2 runs: SELECT forces a
    # round-trip through the open session
    s1.stdin.write("SELECT 1;\n")
    s1.stdin.flush()
    time.sleep(1.0)

    # session 2: full txn — later WAL positions, EARLIER commit
    pg["sql"](
        "INSERT INTO users (name, email) VALUES ('tx2', '2@x')", db="cdc_db"
    )

    # now commit session 1 (its commit record lands after tx2's)
    out, err = s1.communicate("COMMIT;\n", timeout=30)
    assert s1.returncode == 0, f"session1 failed: {err}"

    try:
        got = _collect(client, 2)
        names = [c["after"]["name"] for c in got]
        # commit order, not write order
        assert names == ["tx2", "tx1"]
        stamps = [c["lsn"] for c in got]
        assert stamps[1] > stamps[0] > 0  # monotone despite inverted WAL
        # _collect breaks on the 2nd row BEFORE tx1's Commit frame; drain
        # until the commit boundary is recorded
        end_t = time.time() + 20
        for _ in client.poll(heartbeat=True, idle_timeout=0.2):
            if len(client.txn_bounds) >= 2 or time.time() > end_t:
                break
        ends = [e for _, e in client.txn_bounds]
        assert ends == sorted(ends) and len(ends) >= 2
        # frontier at the last stamp acks tx1's commit end — a real,
        # past-the-commit-record position the server accepts
        acked = client.ack_frontier(stamps[-1])
        assert acked >= ends[-1]
    finally:
        client.close()


def test_live_create_publication_idempotent_and_streams(pg):
    """publication.createIfNotExists against a real server: CREATE
    PUBLICATION over the walsender connection (logical replication
    connections accept simple SQL), idempotent on duplicate_object, and
    the stream actually delivers through the auto-created publication."""
    sock = socket.create_connection(("127.0.0.1", PORT), timeout=30)
    sock.settimeout(30)
    client = PG.ReplicationClient(sock, slot="live_slot_pub", publication="auto_pub")
    client.startup(user="postgres", database="cdc_db")
    client.create_publication()
    client.create_publication()  # duplicate_object 42710 absorbed
    client.create_slot()
    client.start()
    pg["sql"](
        "INSERT INTO users (name, email) VALUES ('pubtest', 'p@x')", db="cdc_db"
    )
    try:
        got = _collect(client, 1)
        assert got and got[0]["after"]["name"] == "pubtest"
    finally:
        client.close()
    assert pg["sql"](
        "SELECT puballtables FROM pg_publication WHERE pubname='auto_pub'",
        db="cdc_db",
    ) == "t"


def test_live_truncate_skipped_but_counted(pg):
    """VERDICT r6 item 7: a TRUNCATE on a replicated table arrives as a
    pgoutput Truncate frame. Parity with the reference is to skip it (no
    tombstones), but the skip must be OBSERVABLE: the counter increments
    and the table is recorded, so the operator can trigger a snapshot
    rebuild instead of serving stale view rows forever."""
    client = _connect("live_slot_trunc")
    client.create_slot()
    client.start()
    pg["sql"](
        "INSERT INTO users (name, email) VALUES ('pre_trunc', 't@x')",
        db="cdc_db",
    )
    pg["sql"]("TRUNCATE users", db="cdc_db")
    pg["sql"](
        "INSERT INTO users (name, email) VALUES ('post_trunc', 't2@x')",
        db="cdc_db",
    )
    try:
        got = _collect(client, 2)
        names = [c["after"]["name"] for c in got]
        assert names == ["pre_trunc", "post_trunc"]  # DML delivered intact
        assert client.truncate_skipped >= 1  # the real frame was counted
        assert "public.users" in client.decoder.truncated_tables
    finally:
        client.close()


@pytest.mark.parametrize("proto_version", [1, 2])
def test_live_chaos_soak_kill_restart_zero_loss(pg, spark, proto_version):
    """VERDICT r6 item 5 (mirrors connector_test.go:428-621 at volume):
    ~100k rows across 4 concurrent writer sessions, with a mid-stream
    walsender kill followed by a full server restart. The consumer
    reconnects on the same slot, redelivers (at-least-once), and the
    seq-resolved keyed merge must land EXACTLY the 100k rows — zero loss,
    zero duplication in the view. Runtime-capped via drain deadlines.

    VERDICT r9 item 5: also run under proto_version=2 with the session's
    logical_decoding_work_mem floored at 64kB, so every 5k-row writer
    transaction arrives as a STREAMED in-progress transaction — the kill
    and reconnect then exercise the v2 buffer/spool/discard machinery at
    soak volume, not just the targeted v2 tests."""
    import glob
    import json as _json
    import subprocess
    import threading

    from go_pq_cdc_elasticsearch_spark.sink.materialized import MaterializedView
    from go_pq_cdc_elasticsearch_spark.sources import wal as W

    N = 100_000
    WRITERS = 4
    table = f"soak_v{proto_version}"
    slot = f"live_slot_soak_v{proto_version}"
    pg["sql"](
        f"CREATE TABLE IF NOT EXISTS {table} (id int PRIMARY KEY, v text NOT NULL)",
        db="cdc_db",
    )
    pg["sql"](f"ALTER PUBLICATION cdc_pub ADD TABLE {table}", db="cdc_db")

    def _soak_connect():
        c = _connect(slot, proto_version=proto_version)
        if proto_version == 2:
            # floor the walsender's decode buffer so every 5k-row writer
            # txn is STREAMED (v2 buffer/spool machinery under soak load)
            c._run_simple_query("SET logical_decoding_work_mem = '64kB'", "SET")
            # spill early: the kill below must be able to catch in-flight
            # txns with spool files on disk, not just in-memory buffers
            c.decoder.stream_spill_threshold = 512
        return c

    client = _soak_connect()
    client.create_slot()
    client.start()
    work = tempfile.mkdtemp(prefix="live_soak_")
    seg_dir = os.path.join(work, "wal")
    ckpt_dir = os.path.join(work, "ckpt")
    stop = threading.Event()

    def consume(c):
        # checkpoint_dir arms the production ack sweep: once the Spark
        # pass below commits a batch, the consumer forwards the committed
        # frontier as StandbyStatusUpdates — the path the storm block at
        # the end exercises
        PG.run_live_consumer(
            c, seg_dir, checkpoint_dir=ckpt_dir,
            batch_size=5000, flush_interval_sec=0.3, stop_event=stop,
        )

    t1 = threading.Thread(target=consume, args=(client,), daemon=True)
    t1.start()

    # 4 concurrent sessions, 5 txns each of 5k rows -> 100k unique ids
    per = N // WRITERS
    chunk = per // 5
    procs = []
    for w in range(WRITERS):
        stmts = []
        for j in range(5):
            lo = w * per + j * chunk + 1
            hi = w * per + (j + 1) * chunk
            stmts.append(
                f"INSERT INTO {table} SELECT g, 'v'||g FROM "
                f"generate_series({lo},{hi}) g;"
            )
        p = subprocess.Popen(
            ["su", "-s", "/bin/bash", "postgres", "-c",
             f"cd /tmp && psql -h 127.0.0.1 -p {PORT} -U postgres -d cdc_db "
             f"-v ON_ERROR_STOP=1"],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        procs.append((p, "\n".join(stmts) + "\n"))
    threads = [
        threading.Thread(target=lambda p=p, s=s: p.communicate(s, timeout=120))
        for p, s in procs
    ]
    for th in threads:
        th.start()

    # wait until some segments flushed (mid-stream), then CHAOS: terminate
    # the walsender backend, then restart the whole server
    deadline = time.time() + 60
    while time.time() < deadline:
        if os.path.isdir(seg_dir) and glob.glob(
            os.path.join(seg_dir, "wal_*.ndjson")
        ):
            break
        time.sleep(0.2)
    pg["sql"](
        "SELECT pg_terminate_backend(active_pid) FROM pg_replication_slots "
        f"WHERE slot_name='{slot}' AND active_pid IS NOT NULL"
    )
    for th in threads:
        th.join(timeout=120)
    for p, _ in procs:
        assert p.returncode == 0, "writer session failed"
    data = os.path.join(pg["work"], "data")
    # -l: without it the restarted postmaster inherits this process's
    # captured stdout pipe and subprocess.run waits on EOF forever
    r = _su(f"pg_ctl -D {data} -l {pg['work']}/server.log -m fast -w -t 180 restart")
    assert r.returncode == 0, f"server restart failed: {r.stderr[-300:]}"
    t1.join(timeout=60)  # consumer exits on the broken socket, flushing

    # reconnect on the SAME slot; redelivery from the slot's restart point
    # is the at-least-once contract — the seq merge absorbs duplicates
    client2 = _soak_connect()
    client2.start()
    t2 = threading.Thread(target=consume, args=(client2,), daemon=True)
    t2.start()

    def distinct_soak_ids() -> int:
        ids = set()
        for f in glob.glob(os.path.join(seg_dir, "wal_*.ndjson")):
            try:
                with open(f) as fh:
                    for line in fh:
                        d = _json.loads(line)
                        if d.get("table_name") == table and d.get("after"):
                            ids.add(int(d["after"]["id"]))
            except (OSError, ValueError):
                continue
        return len(ids)

    deadline = time.time() + 180
    seen = 0
    while time.time() < deadline:
        seen = distinct_soak_ids()
        if seen >= N:
            time.sleep(1.0)  # tail flush
            break
        time.sleep(1.0)
    assert seen >= N, f"only {seen}/{N} distinct rows delivered before deadline"

    # VERDICT r7 item 4 — mid-soak TRUNCATE while the consumer is live:
    # not replicated as deletes (reference parity), but observably counted,
    # and the view built below must still land EXACTLY the 100k rows
    pg["sql"](f"TRUNCATE {table}", db="cdc_db")
    deadline = time.time() + 60
    while time.time() < deadline and client2.truncate_skipped < 1:
        time.sleep(0.2)
    assert client2.truncate_skipped >= 1
    assert f"public.{table}" in client2.decoder.truncated_tables

    # Spark end: segments -> pgwal stream -> keyed seq-resolved view.
    # Redelivered rows carry higher clamp stamps; LWW keeps one row per id.
    # Runs while the consumer is still attached (production shape): the
    # checkpoint this stream writes is what consumer2's ack sweep forwards.
    W.register(spark)
    stream = (
        spark.readStream.format("pgwal").option("path", seg_dir).load()
        .filter(f"table_name = '{table}'")
    )
    from pyspark.sql import functions as F

    shaped = stream.select(
        "lsn",
        "op",
        F.col("after").getItem("id").cast("long").alias("key"),
        F.col("after").getItem("v").alias("v"),
    )
    view = MaterializedView(
        spark, os.path.join(work, "view"),
        keys=("key",), seq_col="lsn", op_col="op", delete_op="DELETE",
    )
    q = (
        shaped.writeStream.foreachBatch(view.foreach_batch_writer())
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    # VERDICT r7 item 4 — empty-txn storm on an UNPUBLISHED table (the r6
    # confirmed_flush-pinning fix's exact trigger): every storm txn is
    # filtered out by the publication, so the client sees no data frames —
    # only walsender progress. The slot must still advance past the storm
    # (no WAL-retention pinning on the primary) while the view stays exact.
    def slot_lsns() -> dict:
        row = pg["sql"](
            "SELECT restart_lsn, confirmed_flush_lsn FROM "
            f"pg_replication_slots WHERE slot_name='{slot}'"
        )
        restart, confirmed = row.split("|")
        return {"restart": _lsn_int(restart), "confirmed": _lsn_int(confirmed)}

    # Take the pre-storm baseline only after the consumer's sweeps have
    # confirmed everything up to the CURRENT WAL position (confirmed_flush
    # is non-zero right away after CREATE_REPLICATION_SLOT, so waiting for
    # "non-zero" waits for nothing — review r7). This wait is itself the
    # first proof of the idle extension: the view pass's frontier ack only
    # covers the last soak commit, and pre_mark lies past it.
    pre_mark = _lsn_int(pg["sql"]("SELECT pg_current_wal_lsn()", db="cdc_db"))
    deadline = time.time() + 90
    pre = slot_lsns()
    while time.time() < deadline and pre["confirmed"] < pre_mark:
        time.sleep(0.5)
        pre = slot_lsns()
    assert pre["confirmed"] >= pre_mark, (
        f"pre-storm acks never reached {pre_mark:#x} "
        f"(confirmed {pre['confirmed']:#x})"
    )
    pg["sql"](
        "CREATE TABLE IF NOT EXISTS soak_noise (id int, v text)", db="cdc_db"
    )
    for _ in range(5):
        pg["sql"](
            "INSERT INTO soak_noise SELECT g, 'n'||g FROM "
            "generate_series(1, 20000) g",
            db="cdc_db",
        )
    storm_end_int = _lsn_int(pg["sql"]("SELECT pg_current_wal_lsn()", db="cdc_db"))
    # restart_lsn advances LAZILY: the server picks a new candidate only
    # at the next xl_running_xacts record (bgwriter, ~15 s cadence) and
    # applies it on the ack AFTER that — poll for both, don't spot-check
    deadline = time.time() + 150
    post = slot_lsns()
    while time.time() < deadline and (
        post["confirmed"] < storm_end_int or post["restart"] <= pre["restart"]
    ):
        time.sleep(0.5)
        post = slot_lsns()
    assert post["confirmed"] >= storm_end_int, (
        f"confirmed_flush pinned at {post['confirmed']:#x} < storm end "
        f"{storm_end_int:#x} — WAL retention on the primary"
    )
    assert post["restart"] > pre["restart"], (
        f"restart_lsn never advanced ({pre['restart']:#x} -> "
        f"{post['restart']:#x})"
    )

    stop.set()  # consume() closes over `stop`; a separate stop2 event
    # here was a no-op, so t2.join always burned its full timeout (r9)
    t2.join(timeout=60)
    client2.close()
    client.close()  # idempotent; discards any v2 buffers the kill stranded

    if proto_version == 2:
        # the soak genuinely exercised the stream machinery: the 64kB
        # work-mem floor must have streamed the 5k-row writer txns (at
        # least across both consumer generations), and the lowered spill
        # threshold must have pushed buffered rows through the spool path
        started = (
            client.decoder.stream_txns_started
            + client2.decoder.stream_txns_started
        )
        spilled = (
            client.decoder.stream_changes_spilled
            + client2.decoder.stream_changes_spilled
        )
        assert started >= 1, "no transaction ever streamed under v2 soak"
        assert spilled > 0, "v2 soak never exercised the disk-spool path"
        # teardown hygiene: close() above ran discard_streams — nothing
        # buffered may survive either consumer generation
        assert not client.decoder.streamed and not client2.decoder.streamed

    agg = view.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("key").alias("nk"),
        F.min("key").alias("lo"),
        F.max("key").alias("hi"),
        F.sum(F.when(F.col("v") == F.concat(F.lit("v"), F.col("key")), 0).otherwise(1)).alias("bad"),
    ).first()
    assert agg["n"] == N and agg["nk"] == N, f"view rows {agg['n']}, keys {agg['nk']}"
    assert agg["lo"] == 1 and agg["hi"] == N
    assert agg["bad"] == 0  # every row carries its correct payload


def test_live_ddl_add_column_and_widen_mid_stream(pg, spark):
    """VERDICT r7 item 1 (mirrors the reference's live-bed style,
    integration_test/connector_test.go:428-621): mid-stream schema
    evolution through the LIVE path. Stream rows, then ALTER TABLE ADD
    COLUMN **and** a type-widening ALTER (int -> bigint on the key),
    stream more rows. Asserts the three layers end to end:

    1. the walsender's Relation re-registration (sources/pgoutput.py R
       frames overwrite ``decoder.relations[relid]``) decodes the NEW
       shape — post-DDL rows carry the added column and an id beyond
       int32, pre-DDL rows don't;
    2. the view's drift-merge (q_c13 semantics: new columns only,
       mergeSchema reconciliation) lands the added column with NULL
       backfill on pre-DDL rows;
    3. zero loss across the DDL boundary — every row from both epochs is
       in the view exactly once with its correct payload.
    """
    import glob
    import json as _json
    import threading

    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.sink.materialized import MaterializedView
    from go_pq_cdc_elasticsearch_spark.sources import wal as W

    pg["sql"](
        "CREATE TABLE IF NOT EXISTS ddl_t (id int PRIMARY KEY, name text NOT NULL)",
        db="cdc_db",
    )
    pg["sql"]("ALTER PUBLICATION cdc_pub ADD TABLE ddl_t", db="cdc_db")

    client = _connect("live_slot_ddl")
    client.create_slot()
    client.start()
    work = tempfile.mkdtemp(prefix="live_ddl_")
    seg_dir = os.path.join(work, "wal")
    stop = threading.Event()
    t = threading.Thread(
        target=PG.run_live_consumer,
        args=(client, seg_dir),
        kwargs={"batch_size": 1, "flush_interval_sec": 0.3, "stop_event": stop},
        daemon=True,
    )
    t.start()

    def ddl_rows() -> list[dict]:
        rows = []
        for f in sorted(glob.glob(os.path.join(seg_dir, "wal_*.ndjson"))):
            try:
                with open(f) as fh:
                    for line in fh:
                        d = _json.loads(line)
                        if d.get("table_name") == "ddl_t":
                            rows.append(d)
            except (OSError, ValueError):
                continue
        return rows

    def wait_rows(n: int, deadline_sec: float = 60.0) -> list[dict]:
        end = time.time() + deadline_sec
        rows = []
        while time.time() < end:
            rows = ddl_rows()
            if len({r["after"]["id"] for r in rows if r.get("after")}) >= n:
                return rows
            time.sleep(0.2)
        raise AssertionError(f"only {len(rows)} ddl_t rows before deadline")

    # epoch 1: pre-DDL shape (id, name)
    for i in (1, 2, 3):
        pg["sql"](
            f"INSERT INTO ddl_t VALUES ({i}, 'u{i}')", db="cdc_db"
        )
    wait_rows(3)

    # first view pass over the pre-DDL segments: columns (key, name) only
    W.register(spark)
    view = MaterializedView(
        spark, os.path.join(work, "view"),
        keys=("key",), seq_col="lsn", op_col="op", delete_op="DELETE",
    )

    def run_view_pass(ckpt: str, with_score: bool) -> None:
        stream = (
            spark.readStream.format("pgwal").option("path", seg_dir).load()
            .filter("table_name = 'ddl_t'")
        )
        cols = [
            F.col("lsn"),
            F.col("op"),
            F.col("after").getItem("id").cast("long").alias("key"),
            F.col("after").getItem("name").alias("name"),
        ]
        if with_score:
            cols.append(F.col("after").getItem("score").cast("int").alias("score"))
        q = (
            stream.select(*cols)
            .writeStream.foreachBatch(view.foreach_batch_writer())
            .option("checkpointLocation", os.path.join(work, ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_view_pass("ckpt_a", with_score=False)
    assert "score" not in view.read().columns  # pre-DDL epoch has no drift
    assert view.read().count() == 3

    # the DDL boundary: add a column AND widen the key type (int->bigint
    # is a full table rewrite server-side; the relation OID is stable, so
    # the decoder's relid-keyed cache must pick the change up from the
    # re-sent Relation frame alone)
    pg["sql"]("ALTER TABLE ddl_t ADD COLUMN score int", db="cdc_db")
    pg["sql"]("ALTER TABLE ddl_t ALTER COLUMN id TYPE bigint", db="cdc_db")

    # epoch 2: rows only represent-able in the NEW shape (id > 2^31)
    pg["sql"](
        "INSERT INTO ddl_t VALUES (4000000000, 'u4', 42)", db="cdc_db"
    )
    pg["sql"](
        "INSERT INTO ddl_t VALUES (5000000001, 'u5', 43)", db="cdc_db"
    )
    rows = wait_rows(5)
    stop.set()
    t.join(timeout=30)
    client.close()

    # layer 1: the decoder saw the re-registered relation — post-DDL rows
    # carry the new column and the widened id; pre-DDL rows carry neither
    by_id = {r["after"]["id"]: r["after"] for r in rows if r.get("after")}
    assert set(by_id) == {"1", "2", "3", "4000000000", "5000000001"}
    for i in ("1", "2", "3"):
        assert "score" not in by_id[i], f"pre-DDL row {i} grew a column"
    assert by_id["4000000000"]["score"] == "42"
    assert by_id["5000000001"]["score"] == "43"

    # layer 2+3: second pass re-reads ALL segments with the post-DDL shape;
    # the view's drift-merge adds `score` with NULL backfill, the seq-LWW
    # merge absorbs the redelivered epoch-1 rows — zero loss, zero dupes
    run_view_pass("ckpt_b", with_score=True)
    got = {r["key"]: r for r in view.read().collect()}
    assert set(got) == {1, 2, 3, 4000000000, 5000000001}
    for i in (1, 2, 3):
        assert got[i]["name"] == f"u{i}"
        assert got[i]["score"] is None  # NULL backfill across the boundary
    assert got[4000000000]["score"] == 42 and got[4000000000]["name"] == "u4"
    assert got[5000000001]["score"] == 43 and got[5000000001]["name"] == "u5"


@pytest.mark.parametrize("proto_version", [1, 2])
def test_live_connector_supervised_reconnect(pg, spark, proto_version):
    """Review r6: run_live_consumer returning on a reconnectable
    termination must NOT silently halt replication — the Connector's
    supervisor reconnects on the same slot. Kill the walsender backend
    AND restart the whole server under a running Connector; rows written
    after the restart must land in the view, and consumer_restarts must
    record the recovery.

    VERDICT r9 item 5, proto_version=2 leg: the session work-mem floor
    (via ReplicationSettings.session_settings, reapplied on every
    reconnect) streams large txns; before the kill a big transaction is
    held OPEN so the consumer has it buffered with a spool file on disk,
    and the reconnect teardown must run discard_streams on the OLD
    client — observed directly (buffer emptied, spool unlinked). After
    recovery a committed 5k-row txn must stream end-to-end into the
    view through the NEW session."""
    import glob

    from go_pq_cdc_elasticsearch_spark.connector import (
        Connector,
        ConnectorConfig,
        ReplicationSettings,
    )

    table = f"sup_v{proto_version}"
    slot = f"live_slot_sup_v{proto_version}"
    pg["sql"](
        f"CREATE TABLE IF NOT EXISTS {table} (id int PRIMARY KEY, v text NOT NULL)",
        db="cdc_db",
    )
    pg["sql"](f"ALTER PUBLICATION cdc_pub ADD TABLE {table}", db="cdc_db")
    work = tempfile.mkdtemp(prefix="conn_sup_")
    spill_dir = os.path.join(work, "spill")
    os.makedirs(spill_dir)
    cfg = ConnectorConfig(
        staged_dir=os.path.join(work, "staged"),
        view_path=os.path.join(work, "view"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        keys=("id",),
        seq_col="lsn",
        op_col="op",
        delete_op="DELETE",
        replication=ReplicationSettings(
            host="127.0.0.1", port=PORT, slot=slot,
            publication="cdc_pub", database="cdc_db",
            # v1 keeps the original tiny batch (2-row scenario); the v2
            # leg pushes a 2k-row streamed txn through the view, which at
            # batch_size=2 means ~1000 segment files — minutes of staging
            batch_size=2 if proto_version == 1 else 500,
            ack_interval_sec=0.2,
            proto_version=proto_version,
            stream_spill_dir=spill_dir if proto_version == 2 else None,
            session_settings=(
                {"logical_decoding_work_mem": "64kB"}
                if proto_version == 2 else {}
            ),
        ),
    )
    c = Connector(spark, cfg)
    c.start()
    held = None
    try:
        assert c.wait_until_ready(timeout_sec=120)
        pg["sql"](f"INSERT INTO {table} VALUES (1, 'before')", db="cdc_db")
        deadline = time.time() + 60
        while time.time() < deadline and not glob.glob(
            os.path.join(work, "staged", "wal_*.ndjson")
        ):
            time.sleep(0.2)

        old_client = c._repl_client
        if proto_version == 2:
            # force the spool path, then hold a big txn OPEN so the kill
            # catches it buffered (segments received, commit pending)
            old_client.decoder.stream_spill_threshold = 8
            held = subprocess.Popen(
                ["su", "-s", "/bin/bash", "postgres", "-c",
                 f"cd /tmp && psql -h 127.0.0.1 -p {PORT} -U postgres "
                 f"-d cdc_db -v ON_ERROR_STOP=1"],
                stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True,
            )
            held.stdin.write(
                f"BEGIN;\nINSERT INTO {table} "
                "SELECT g, 'held'||g FROM generate_series(1000, 3999) g;\n"
                "SELECT 1;\n"
            )
            held.stdin.flush()
            deadline = time.time() + 60
            while time.time() < deadline and not (
                old_client.decoder.streamed
                and glob.glob(os.path.join(spill_dir, "pgstream-*.jsonl"))
            ):
                time.sleep(0.2)
            assert old_client.decoder.streamed, "held txn never streamed"
            assert glob.glob(os.path.join(spill_dir, "pgstream-*.jsonl")), \
                "held txn never reached the spool"

        # chaos: kill the walsender, then restart the whole server
        pg["sql"](
            "SELECT pg_terminate_backend(active_pid) FROM pg_replication_slots "
            f"WHERE slot_name='{slot}' AND active_pid IS NOT NULL"
        )
        data = os.path.join(pg["work"], "data")
        r = _su(
            f"pg_ctl -D {data} -l {pg['work']}/server.log -m fast -w -t 180 restart"
        )
        assert r.returncode == 0, f"server restart failed: {r.stderr[-300:]}"

        # generous deadline: under full-suite load the restart + backoff
        # cycle has measured out past 90 s on this host
        deadline = time.time() + 180
        while time.time() < deadline and c.consumer_restarts < 1:
            time.sleep(0.5)
        assert c.consumer_restarts >= 1, (
            f"supervisor never reconnected (consumer_error="
            f"{c.consumer_error!r})"
        )
        assert c.consumer_error is None

        if proto_version == 2:
            # the held txn died with the server restart (aborted, never
            # redelivered); the reconnect teardown closed the OLD client,
            # whose close() runs discard_streams — observed directly:
            assert not old_client.decoder.streamed, (
                "reconnect teardown left buffered streamed txns behind"
            )
            assert not glob.glob(
                os.path.join(spill_dir, "pgstream-*.jsonl")
            ), "reconnect teardown left spool files behind"
            assert c._repl_client is not old_client  # genuinely new session

        pg["sql"](f"INSERT INTO {table} VALUES (2, 'after')", db="cdc_db")
        expect = {"1": "before", "2": "after"}
        if proto_version == 2:
            # a COMMITTED big txn through the NEW session: the reapplied
            # session work-mem floor must stream it (proves
            # session_settings survive reconnects), and it must land in
            # the view end to end
            pg["sql"](
                f"INSERT INTO {table} "
                "SELECT g, 'post'||g FROM generate_series(5000, 6999) g",
                db="cdc_db",
            )
            expect.update({str(g): f"post{g}" for g in range(5000, 7000)})
        deadline = time.time() + 180
        state = {}
        while time.time() < deadline:
            state = _view_state(c) or {}
            if set(expect) <= set(state):
                break
            time.sleep(0.5)
        assert {k: state.get(k) for k in expect} == expect, (
            f"{len(state)} rows; sample diff: "
            f"{[(k, state.get(k), expect[k]) for k in list(expect)[:5]]}"
        )
        if proto_version == 2:
            # tolerate a FURTHER load-induced reconnect after the post
            # txn streamed (counters are per-session; delivery is already
            # proven by the expect poll above)
            assert (
                c._repl_client.decoder.stream_txns_started >= 1
                or c.consumer_restarts > 1
            ), (
                "post-reconnect session never streamed (session_settings "
                f"not reapplied? restarts={c.consumer_restarts})"
            )
    finally:
        c.close()
        if held is not None:
            held.stdin.close()
            held.wait(timeout=30)


def test_live_single_giant_transaction_bounded_stream_ack_past_commit(pg, spark):
    """VERDICT r8 item 3 — ONE ~100k-row transaction through the real
    walsender (the reference processes per-event regardless of txn size,
    go-pq-cdc connector.go:129-172; pgoutput v1 delivers a big txn as a
    commit-time frame burst). Three contracts, each asserted on live
    behavior, not code shape:

    1. bounded consumer memory: segments hit disk WHILE the burst is still
       being delivered (streaming, not buffer-the-txn), and no segment
       ever carries more than one flush buffer (batch_size rows);
    2. no ack at or past the commit record's LSN lands before the Commit
       frame is processed — asserted in protocol order via a single-
       consumer-thread event log of every StandbyStatusUpdate and every
       recorded commit bound (acking >= commit_end mid-burst would lose
       the whole transaction on a crash-resume);
    3. zero loss: the seq-resolved view lands exactly the 100k rows, and
       the slot's confirmed_flush does advance past the commit record
       once the Spark checkpoint covers the delivered stamps.
    """
    import collections
    import glob
    import json as _json
    import threading

    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.sink.materialized import MaterializedView
    from go_pq_cdc_elasticsearch_spark.sources import wal as W

    N = 100_000
    BATCH = 2000
    pg["sql"](
        "CREATE TABLE IF NOT EXISTS giant (id int PRIMARY KEY, v text NOT NULL)",
        db="cdc_db",
    )
    pg["sql"]("ALTER PUBLICATION cdc_pub ADD TABLE giant", db="cdc_db")

    client = _connect("live_slot_giant")
    client.create_slot()

    # Event log in PROTOCOL order: acks (keepalive replies, sweep
    # heartbeats, frontier acks) and commit-bound records all happen on
    # the consumer thread, so one appended list IS the wire order.
    events: list = []
    real_ack = client.ack

    def spy_ack(lsn: int) -> None:
        events.append(("ack", lsn))
        real_ack(lsn)

    client.ack = spy_ack

    class _RecordingBounds(collections.deque):
        def append(self, item):  # (last_stamp, commit_end_lsn)
            events.append(("commit", item[1]))
            super().append(item)

    client.txn_bounds = _RecordingBounds(client.txn_bounds)

    client.start()
    work = tempfile.mkdtemp(prefix="live_giant_")
    seg_dir = os.path.join(work, "wal")
    ckpt_dir = os.path.join(work, "ckpt")
    stop = threading.Event()
    t = threading.Thread(
        target=PG.run_live_consumer,
        args=(client, seg_dir),
        kwargs={
            "checkpoint_dir": ckpt_dir,
            "batch_size": BATCH,
            "flush_interval_sec": 0.3,
            "ack_interval_sec": 0.5,
            "stop_event": stop,
        },
        daemon=True,
    )
    t.start()

    pre_mark = _lsn_int(pg["sql"]("SELECT pg_current_wal_lsn()", db="cdc_db"))
    # ONE statement = ONE transaction = one commit-time burst of 100k rows
    pg["sql"](
        f"INSERT INTO giant SELECT g, 'v'||g FROM generate_series(1,{N}) g",
        db="cdc_db",
    )

    def seg_files() -> dict:
        out = {}
        for f in glob.glob(os.path.join(seg_dir, "wal_*.ndjson")):
            try:
                with open(f, "rb") as fh:
                    out[f] = sum(1 for _ in fh)
            except OSError:
                continue
        return out

    # contract 1: segments appear mid-burst; every file <= one flush buffer
    observed_partial = False
    per_file: dict = {}
    deadline = time.time() + 300
    while time.time() < deadline:
        per_file = seg_files()
        total = sum(per_file.values())
        if 0 < total < N and per_file:
            observed_partial = True
        if total >= N:
            break
        time.sleep(0.25)
    assert sum(per_file.values()) >= N, (
        f"only {sum(per_file.values())}/{N} rows delivered before deadline"
    )
    assert observed_partial, (
        "no partial segment state ever observed — the consumer buffered "
        "the whole transaction before flushing"
    )
    assert max(per_file.values()) <= BATCH, (
        f"a segment carries {max(per_file.values())} rows > batch_size "
        f"{BATCH} — flush boundedness broken"
    )
    assert len(per_file) >= N // BATCH
    # exact delivery check (ids, not just line counts)
    ids = set()
    for f in per_file:
        with open(f) as fh:
            for line in fh:
                d = _json.loads(line)
                if d.get("table_name") == "giant" and d.get("after"):
                    ids.add(int(d["after"]["id"]))
    assert len(ids) == N and min(ids) == 1 and max(ids) == N

    # contract 2: protocol-order ack audit. The giant txn's commit bound is
    # the first recorded commit past pre_mark (the slot was created fresh;
    # PG >= 15 sends no frames for publication-filtered txns).
    snapshot = list(events)
    commit_ends = [l for k, l in snapshot if k == "commit" and l > pre_mark]
    assert commit_ends, "giant txn commit frame never recorded"
    giant_end = commit_ends[0]
    commit_idx = snapshot.index(("commit", giant_end))
    acks_before_commit = [l for k, l in snapshot[:commit_idx] if k == "ack"]
    assert all(l < giant_end for l in acks_before_commit), (
        f"an ack >= the commit record {giant_end:#x} was sent before the "
        f"Commit frame was processed: "
        f"{[hex(l) for l in acks_before_commit if l >= giant_end]}"
    )

    # contract 3: view lands exactly N; ack then advances past the commit
    W.register(spark)
    stream = (
        spark.readStream.format("pgwal").option("path", seg_dir).load()
        .filter("table_name = 'giant'")
    )
    shaped = stream.select(
        "lsn",
        "op",
        F.col("after").getItem("id").cast("long").alias("key"),
        F.col("after").getItem("v").alias("v"),
    )
    view = MaterializedView(
        spark, os.path.join(work, "view"),
        keys=("key",), seq_col="lsn", op_col="op", delete_op="DELETE",
    )
    q = (
        shaped.writeStream.foreachBatch(view.foreach_batch_writer())
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    deadline = time.time() + 120
    confirmed = 0
    while time.time() < deadline:
        row = pg["sql"](
            "SELECT confirmed_flush_lsn FROM pg_replication_slots "
            "WHERE slot_name='live_slot_giant'"
        )
        confirmed = _lsn_int(row)
        if confirmed >= giant_end:
            break
        time.sleep(0.5)
    assert confirmed >= giant_end, (
        f"confirmed_flush {confirmed:#x} never reached the giant txn's "
        f"commit record {giant_end:#x}"
    )

    stop.set()
    t.join(timeout=60)
    client.close()

    agg = view.read().agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("key").alias("nk"),
        F.min("key").alias("lo"),
        F.max("key").alias("hi"),
        F.sum(
            F.when(F.col("v") == F.concat(F.lit("v"), F.col("key")), 0).otherwise(1)
        ).alias("bad"),
    ).first()
    assert agg["n"] == N and agg["nk"] == N, f"view rows {agg['n']}, keys {agg['nk']}"
    assert agg["lo"] == 1 and agg["hi"] == N and agg["bad"] == 0


def test_live_ddl_drop_column_mid_stream(pg, spark):
    """VERDICT r8 item 4 — ALTER TABLE DROP COLUMN through the LIVE path
    (complements the ADD COLUMN + widen test above; the r5 sweep fixed
    drift re-arming after a dropped column only at the view layer). Layers:

    1. the walsender re-sends the Relation frame with the NARROWER tuple
       and the relid-keyed decoder cache picks it up — post-DDL rows
       (including an UPDATE of a pre-DDL row) carry no trace of the
       dropped column, pre-DDL rows keep theirs in the segments;
    2. post-DDL rows land in the view, and the view KEEPS the dropped
       column per the drift contract (drift = new columns only; a batch
       missing / NULL in a known column writes the superset): rows
       re-touched after the DDL go NULL-stale in that column, untouched
       rows keep their last pre-DDL value;
    3. zero loss across the DDL boundary.
    """
    import glob
    import json as _json
    import threading

    from pyspark.sql import functions as F

    from go_pq_cdc_elasticsearch_spark.sink.materialized import MaterializedView
    from go_pq_cdc_elasticsearch_spark.sources import wal as W

    pg["sql"](
        "CREATE TABLE IF NOT EXISTS ddl_drop "
        "(id int PRIMARY KEY, name text NOT NULL, extra text)",
        db="cdc_db",
    )
    pg["sql"]("ALTER TABLE ddl_drop REPLICA IDENTITY FULL", db="cdc_db")
    pg["sql"]("ALTER PUBLICATION cdc_pub ADD TABLE ddl_drop", db="cdc_db")

    client = _connect("live_slot_drop")
    client.create_slot()
    client.start()
    work = tempfile.mkdtemp(prefix="live_drop_")
    seg_dir = os.path.join(work, "wal")
    stop = threading.Event()
    t = threading.Thread(
        target=PG.run_live_consumer,
        args=(client, seg_dir),
        kwargs={"batch_size": 1, "flush_interval_sec": 0.3, "stop_event": stop},
        daemon=True,
    )
    t.start()

    def drop_rows() -> list[dict]:
        rows = []
        for f in sorted(glob.glob(os.path.join(seg_dir, "wal_*.ndjson"))):
            try:
                with open(f) as fh:
                    for line in fh:
                        d = _json.loads(line)
                        if d.get("table_name") == "ddl_drop":
                            rows.append(d)
            except (OSError, ValueError):
                continue
        return rows

    def wait_changes(n: int, deadline_sec: float = 60.0) -> list[dict]:
        end = time.time() + deadline_sec
        rows = []
        while time.time() < end:
            rows = drop_rows()
            if len(rows) >= n:
                return rows
            time.sleep(0.2)
        raise AssertionError(f"only {len(rows)} ddl_drop changes before deadline")

    # epoch 1: full pre-DDL shape, extra populated
    for i, (nm, ex) in enumerate(
        [("a", "e1"), ("b", "e2"), ("k", "e10")], start=1
    ):
        pg["sql"](
            f"INSERT INTO ddl_drop VALUES ({i}, '{nm}', '{ex}')", db="cdc_db"
        )
    wait_changes(3)

    # first view pass: columns (key, name, extra)
    W.register(spark)
    view = MaterializedView(
        spark, os.path.join(work, "view"),
        keys=("key",), seq_col="lsn", op_col="op", delete_op="DELETE",
    )

    def run_view_pass(ckpt: str) -> None:
        stream = (
            spark.readStream.format("pgwal").option("path", seg_dir).load()
            .filter("table_name = 'ddl_drop'")
        )
        q = (
            stream.select(
                F.col("lsn"),
                F.col("op"),
                F.col("after").getItem("id").cast("long").alias("key"),
                F.col("after").getItem("name").alias("name"),
                # getItem on a map without the key is NULL — the same
                # select works across the DDL boundary
                F.col("after").getItem("extra").alias("extra"),
            )
            .writeStream.foreachBatch(view.foreach_batch_writer())
            .option("checkpointLocation", os.path.join(work, ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_view_pass("ckpt_a")
    pre = {r["key"]: r for r in view.read().collect()}
    assert {k: v["extra"] for k, v in pre.items()} == {1: "e1", 2: "e2", 3: "e10"}

    # the DDL boundary
    pg["sql"]("ALTER TABLE ddl_drop DROP COLUMN extra", db="cdc_db")

    # epoch 2: a NEW row and an UPDATE of a pre-DDL row, both in the
    # narrowed shape (5 changes total: 3 inserts + 1 insert + 1 update)
    pg["sql"]("INSERT INTO ddl_drop VALUES (4, 'c')", db="cdc_db")
    pg["sql"]("UPDATE ddl_drop SET name = 'a2' WHERE id = 1", db="cdc_db")
    rows = wait_changes(5)
    stop.set()
    t.join(timeout=30)
    client.close()

    # layer 1: decoder saw the narrower Relation — no trace of `extra` in
    # any post-DDL image (after OR before), while pre-DDL rows keep theirs
    pre_ddl = [r for r in rows[:3]]
    assert all(r["after"].get("extra") for r in pre_ddl)
    post_ddl = rows[3:]
    assert len(post_ddl) == 2
    ins4 = next(r for r in post_ddl if r["op"] == "INSERT")
    upd1 = next(r for r in post_ddl if r["op"] == "UPDATE")
    assert ins4["after"]["id"] == "4" and "extra" not in ins4["after"]
    assert upd1["after"]["id"] == "1" and upd1["after"]["name"] == "a2"
    assert "extra" not in upd1["after"]
    # REPLICA IDENTITY FULL before-image is also in the narrowed shape
    assert upd1.get("before") and "extra" not in upd1["before"]

    # layers 2+3: second pass (fresh checkpoint) re-reads ALL segments;
    # redelivered epoch-1 rows are value-identical to state (tie-safe),
    # the epoch-2 update carries a higher lsn and wins
    run_view_pass("ckpt_b")
    got = {r["key"]: r for r in view.read().collect()}
    assert set(got) == {1, 2, 3, 4}, "zero-loss across the DDL boundary"
    assert "extra" in view.read().columns  # the view KEEPS the column
    assert got[1]["name"] == "a2" and got[1]["extra"] is None  # NULL-stale
    assert got[2]["name"] == "b" and got[2]["extra"] == "e2"  # untouched
    assert got[3]["name"] == "k" and got[3]["extra"] == "e10"
    assert got[4]["name"] == "c" and got[4]["extra"] is None  # post-DDL row


def test_live_proto_v2_streamed_transactions(pg):
    """Protocol v2 against the real PG 15 walsender: with this session's
    logical_decoding_work_mem forced to the 64kB floor, a multi-thousand-row
    transaction exceeds the walsender's reorder buffer and is STREAMED
    while still open (Stream Start/Stop segments, xid-prefixed content
    frames) instead of bursting at commit. Proves end-to-end on the real
    wire: (1) streamed rows are buffered — spilling to disk past the
    client threshold — and released exactly once at Stream Commit, in
    commit order with monotone stamps; (2) a ROLLBACK'd streamed
    transaction delivers nothing (Stream Abort discards the buffer, spool
    included); (3) a ROLLBACK TO SAVEPOINT inside a streamed transaction
    discards only the subtransaction's rows (Stream Abort with subxid);
    (4) the ack path is unchanged — the frontier translates to the stream
    commit's end_lsn and confirmed_flush advances past it."""
    client = _connect("live_slot_v2", proto_version=2)
    # the decoding context created at START_REPLICATION inherits this
    # walsender session's GUCs (logical replication connections accept
    # plain SQL): the 64kB floor makes ~5k-row txns stream
    client._run_simple_query("SET logical_decoding_work_mem = '64kB'", "SET")
    client.create_slot()
    # tiny in-memory threshold so the client-side disk spill engages on
    # test-sized data (production default is 8192)
    client.decoder.stream_spill_threshold = 512
    client.start()

    n_commit, n_abort, n_sub = 5000, 5000, 3000
    # (1) one big COMMITTED transaction
    pg["sql"](
        "INSERT INTO users (name, email) "
        f"SELECT 'v2_'||g, g||'@v2' FROM generate_series(1,{n_commit}) g",
        db="cdc_db",
    )
    # (2) one big ROLLBACK'd transaction — already streamed when it aborts
    pg["sql"](
        "BEGIN; INSERT INTO users (name, email) "
        f"SELECT 'v2gone_'||g, NULL FROM generate_series(1,{n_abort}) g; "
        "ROLLBACK;",
        db="cdc_db",
    )
    # (3) savepoint rollback inside a streamed transaction: keep1/keep2
    # survive, the subtransaction's rows must not
    pg["sql"](
        "BEGIN; "
        "INSERT INTO users (name, email) VALUES ('v2keep1', 'k1@v2'); "
        "SAVEPOINT sp; "
        "INSERT INTO users (name, email) "
        f"SELECT 'v2sub_'||g, NULL FROM generate_series(1,{n_sub}) g; "
        "ROLLBACK TO sp; "
        "INSERT INTO users (name, email) VALUES ('v2keep2', 'k2@v2'); "
        "COMMIT;",
        db="cdc_db",
    )

    try:
        got = _collect(client, n_commit + 2, deadline_sec=120.0)
        names = [c["after"]["name"] for c in got]
        assert len(got) == n_commit + 2, f"got {len(got)} rows"
        # exactly-once, commit-ordered: all v2_ rows first, then the two
        # savepoint-survivors; nothing from the aborted txn or subtxn
        assert names[:n_commit] == [f"v2_{i}" for i in range(1, n_commit + 1)]
        assert names[n_commit:] == ["v2keep1", "v2keep2"]
        assert not [n for n in names if n.startswith(("v2gone_", "v2sub_"))]
        stamps = [c["lsn"] for c in got]
        assert stamps == sorted(stamps) and len(set(stamps)) == len(stamps)
        # all three transactions actually STREAMED (the server chose v2
        # delivery, this test didn't just replay the v1 path), the client
        # spilled to disk, and the aborts were observed
        d = client.decoder
        assert d.stream_txns_started >= 3, d
        assert d.stream_txns_committed >= 2, d
        assert d.stream_txns_aborted >= 1, d
        assert d.stream_subtxns_aborted >= 1, d
        assert d.stream_changes_spilled > 0, d
        assert not d.streamed  # every buffer drained or discarded
        # streamed rows carry the commit timestamp
        assert all(c["ts"] for c in got)
        # ack path: frontier -> stream commit end_lsn; server accepts it
        acked = client.ack_frontier(stamps[-1])
        assert acked > 0
        deadline = time.time() + 30
        while time.time() < deadline:
            flushed = pg["sql"](
                "SELECT confirmed_flush_lsn FROM pg_replication_slots "
                "WHERE slot_name='live_slot_v2'"
            )
            if flushed and _lsn_int(flushed) >= acked:
                break
            time.sleep(0.5)
        assert _lsn_int(flushed) >= acked, (flushed, acked)
    finally:
        client.close()
    # no spool files left behind
    import glob as _glob
    import tempfile as _tf

    assert not _glob.glob(os.path.join(_tf.gettempdir(), "pgstream-*.jsonl"))


def test_live_proto_v2_full_consumer_chain_to_spark_view(pg, spark):
    """Protocol v2 through the FULL production chain: walsender (streaming
    a large in-progress txn) -> run_live_consumer -> wal segment files ->
    pgwal Spark source -> keyed materialized view. The consumer loop is
    version-agnostic by design (poll() releases streamed txns as ordinary
    change dicts); this proves it end-to-end — segment stamps stay
    monotone, the view lands every committed row exactly once, and a
    concurrently ROLLBACK'd streamed txn contributes nothing."""
    import threading

    from go_pq_cdc_elasticsearch_spark.sink.materialized import MaterializedView
    from go_pq_cdc_elasticsearch_spark.sources import wal as W

    client = _connect("live_slot_v2_e2e", proto_version=2)
    client._run_simple_query("SET logical_decoding_work_mem = '64kB'", "SET")
    client.create_slot()
    client.start()
    work = tempfile.mkdtemp(prefix="live_v2_e2e_")
    seg_dir = os.path.join(work, "wal")
    stop = threading.Event()
    t = threading.Thread(
        target=PG.run_live_consumer,
        args=(client, seg_dir),
        kwargs={"batch_size": 500, "flush_interval_sec": 0.5, "stop_event": stop},
        daemon=True,
    )
    t.start()
    n = 4000
    pg["sql"](
        "INSERT INTO users (name, email) "
        f"SELECT 'v2e2e_'||g, g||'@e2e' FROM generate_series(1,{n}) g",
        db="cdc_db",
    )
    pg["sql"](
        "BEGIN; INSERT INTO users (name, email) "
        f"SELECT 'v2e2egone_'||g, NULL FROM generate_series(1,{n}) g; "
        "ROLLBACK;",
        db="cdc_db",
    )
    # wait until the segments carry all n committed rows (the consumer
    # flushes on batch_size/time; the aborted txn must add nothing)
    deadline = time.time() + 60
    count = 0
    while time.time() < deadline:
        if os.path.isdir(seg_dir):
            count = 0
            for f in sorted(os.listdir(seg_dir)):
                if f.startswith("wal_") and f.endswith(".ndjson"):
                    with open(os.path.join(seg_dir, f)) as fh:
                        count += sum(1 for _ in fh)
            if count >= n:
                time.sleep(1.0)  # allow any tail flush
                break
        time.sleep(0.3)
    stop.set()
    t.join(timeout=30)
    assert client.decoder.stream_txns_started >= 2  # both txns streamed
    assert client.decoder.stream_txns_aborted >= 1
    client.close()

    W.register(spark)
    stream = spark.readStream.format("pgwal").option("path", seg_dir).load()
    view = MaterializedView(
        spark,
        os.path.join(work, "view"),
        keys=("key",),
        seq_col="lsn",
        op_col="op",
        delete_op="DELETE",
    )
    from pyspark.sql import functions as F

    shaped = stream.select(
        "lsn",
        "op",
        F.coalesce(F.col("after"), F.col("before")).getItem("name").alias("key"),
        F.coalesce(F.col("after"), F.col("before")).getItem("email").alias("email"),
    )
    q = (
        shaped.writeStream.foreachBatch(view.foreach_batch_writer())
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = view.read().filter(F.col("key").startswith("v2e2e")).collect()
    state = {r["key"]: r["email"] for r in rows}
    assert len(state) == n, f"expected {n} committed keys, got {len(state)}"
    for g in (1, n // 2, n):
        assert state[f"v2e2e_{g}"] == f"{g}@e2e"
    assert not [k for k in state if k.startswith("v2e2egone_")]


def test_live_proto_v2_crash_mid_stream_redelivers_in_full(pg):
    """The v2 at-least-once story: a consumer that dies AFTER receiving
    stream segments but BEFORE the Stream Commit has delivered nothing
    downstream (the buffer dies with it) — and because acks only advance
    at commit records, a fresh client on the same slot receives the WHOLE
    transaction after it commits, exactly once. Deterministic: the
    transaction is held open from a separate psql session while the first
    consumer observes its segments, so no kill-timing race."""
    import subprocess

    client = _connect("live_slot_v2_crash", proto_version=2)
    client._run_simple_query("SET logical_decoding_work_mem = '64kB'", "SET")
    client.create_slot()
    client.start()

    # hold a big txn OPEN in a second session: with the 64kB floor the
    # walsender streams its segments while it is still uncommitted
    s1 = subprocess.Popen(
        ["su", "-s", "/bin/bash", "postgres", "-c",
         f"cd /tmp && psql -h 127.0.0.1 -p {PORT} -U postgres -d cdc_db "
         f"-v ON_ERROR_STOP=1"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True,
    )
    n = 3000
    s1.stdin.write(
        "BEGIN;\nINSERT INTO users (name, email) "
        f"SELECT 'v2crash_'||g, g||'@c' FROM generate_series(1,{n}) g;\n"
        "SELECT 1;\n"
    )
    s1.stdin.flush()

    # wait until the first consumer has SEEN stream segments (buffered,
    # nothing deliverable yet — poll only heartbeats)
    deadline = time.time() + 30
    got_pre = []
    for ch in client.poll(heartbeat=True, idle_timeout=0.2):
        if ch is not None:
            got_pre.append(ch)
        if client.decoder.stream_txns_started >= 1 or time.time() > deadline:
            break
    assert client.decoder.stream_txns_started >= 1, "txn never streamed"
    assert not got_pre, "uncommitted streamed rows must not be delivered"
    flushed = client.flushed_lsn
    client.close()  # crash: the buffered segments die with the consumer

    # now the transaction commits — only after the crash
    out, err = s1.communicate("COMMIT;\n", timeout=30)
    assert s1.returncode == 0, f"held session failed: {err}"

    client2 = _connect("live_slot_v2_crash", proto_version=2)
    client2._run_simple_query("SET logical_decoding_work_mem = '64kB'", "SET")
    client2.start(start_lsn=flushed)
    try:
        got = _collect(client2, n, deadline_sec=120.0)
        names = [c["after"]["name"] for c in got]
        assert names == [f"v2crash_{i}" for i in range(1, n + 1)]
        stamps = [c["lsn"] for c in got]
        assert stamps == sorted(stamps) and len(set(stamps)) == len(stamps)
    finally:
        client2.close()


@pytest.mark.parametrize("proto_version", [1, 2])
def test_live_initial_mode_snapshot_stream_handoff_under_concurrent_writes(
    pg, spark, proto_version
):
    """VERDICT r9 item 1 — the one reference-proven end-to-end contract
    that was only fake-tested: initial mode's slot-BEFORE-snapshot
    handoff under writers racing the backfill
    (integration_test/snapshot_test.go:25-193: pre-seeded rows arrive
    via snapshot, concurrent inserts via the stream, zero gap and zero
    duplication; connector.py:160's ordering rationale, proven here
    against the real walsender).

    The race is made DETERMINISTIC, not hoped-for: the snapshot read is
    a lazy mapInPandas that (1) reads the first half of the table, (2)
    signals the writer, (3) waits for the writer's racing DML to land,
    (4) reads the second half. Because Connector.start() evaluates the
    snapshot AFTER CREATE_REPLICATION_SLOT and BEFORE
    START_REPLICATION, every racing change is guaranteed to fall inside
    the backfill window — and the snapshot is guaranteed to be PARTLY
    STALE (first half read pre-DML) and PARTLY FRESH (second half read
    post-DML), so the merge must absorb both directions at once:
      - ids 1..100 updated after their snapshot read: the stream's
        higher-seq UPDATE must beat the stale snapshot row (lsn=0);
      - ids 151..200 updated before their snapshot read: snapshot and
        stream deliver the same final value — idempotent overlap, no
        flap, no dup;
      - ids 281..300 deleted mid-backfill: absent from phase-2 AND
        tombstoned by the stream — gone either way;
      - ids 301..400 inserted mid-backfill: phase-2 captures them AND
        the stream redelivers them — exactly one row each;
      - ids 101..150 / 201..280 untouched: snapshot-only rows survive.
    """
    import threading

    from pyspark.sql import functions as F  # noqa: F401 (schema literals)

    from go_pq_cdc_elasticsearch_spark.connector import (
        Connector,
        ConnectorConfig,
        ReplicationSettings,
    )

    table = f"handoff_v{proto_version}"
    pg["sql"](
        f"CREATE TABLE IF NOT EXISTS {table} (id int PRIMARY KEY, v text NOT NULL)",
        db="cdc_db",
    )
    pg["sql"](f"ALTER TABLE {table} REPLICA IDENTITY FULL", db="cdc_db")
    pg["sql"](f"ALTER PUBLICATION cdc_pub ADD TABLE {table}", db="cdc_db")
    pg["sql"](
        f"INSERT INTO {table} SELECT g, 'seed' FROM generate_series(1, 300) g",
        db="cdc_db",
    )

    work = tempfile.mkdtemp(prefix="conn_handoff_")
    flag_phase1 = os.path.join(work, "snap_phase1")
    flag_dml_done = os.path.join(work, "dml_done")
    port = PORT  # captured by value for the executor-side closure
    psql_bin = os.path.join(_PG_BINDIR, "psql") if _PG_BINDIR else "psql"

    def lazy_snapshot(_it):
        # runs INSIDE Connector.start(), after slot creation: a real
        # backfill read racing real writers. psql straight from the
        # Python worker (trust auth covers host connections too).
        import subprocess as sp
        import time as _t

        import pandas as pd

        def read_rows(where):
            r = sp.run(
                [psql_bin, "-h", "127.0.0.1", "-p", str(port), "-U",
                 "postgres", "-d", "cdc_db", "-Atc",
                 f"SELECT id, v FROM {table} WHERE {where} ORDER BY id"],
                capture_output=True, text=True, timeout=60,
            )
            assert r.returncode == 0, f"snapshot psql failed: {r.stderr}"
            rows = []
            for line in r.stdout.strip().splitlines():
                i, v = line.split("|", 1)
                rows.append((0, "INSERT", int(i), {"id": i, "v": v}))
            return rows

        rows = read_rows("id <= 150")  # pre-DML: guaranteed-stale half
        with open(flag_phase1, "w"):
            pass
        deadline = _t.time() + 120
        while not os.path.exists(flag_dml_done):
            if _t.time() > deadline:
                raise TimeoutError("writer never finished its racing DML")
            _t.sleep(0.1)
        rows += read_rows("id > 150")  # post-DML: guaranteed-fresh half
        yield pd.DataFrame(rows, columns=["lsn", "op", "id", "payload"])

    snap = spark.range(1).mapInPandas(
        lazy_snapshot,
        schema="lsn long, op string, id int, payload map<string,string>",
    )

    writer_err: list = []

    def racing_writer():
        try:
            deadline = time.time() + 180
            while not os.path.exists(flag_phase1):
                if time.time() > deadline:
                    raise TimeoutError("snapshot phase 1 never signalled")
                time.sleep(0.1)
            pg["sql"](
                f"UPDATE {table} SET v='updated' WHERE id <= 100", db="cdc_db"
            )
            pg["sql"](
                f"UPDATE {table} SET v='updated2' WHERE id BETWEEN 151 AND 200",
                db="cdc_db",
            )
            pg["sql"](
                f"DELETE FROM {table} WHERE id BETWEEN 281 AND 300", db="cdc_db"
            )
            # v2 leg: the insert wave carries a ~1.2 KB pad so its ONE
            # transaction exceeds the 64kB work-mem floor and arrives
            # STREAMED (100 rows x ~1.3 KB decoded ≈ 130 KB); the v1 leg
            # keeps the same payload so both legs assert identical values
            pg["sql"](
                f"INSERT INTO {table} "
                "SELECT g, 'new' || repeat('y', 1200) "
                "FROM generate_series(301, 400) g",
                db="cdc_db",
            )
        except BaseException as e:  # surface in the main thread's assert
            writer_err.append(e)
        finally:
            with open(flag_dml_done, "w"):
                pass

    t = threading.Thread(target=racing_writer, daemon=True)
    t.start()

    cfg = ConnectorConfig(
        staged_dir=os.path.join(work, "staged"),
        view_path=os.path.join(work, "view"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        snapshot_mode="initial",
        keys=("id",),
        seq_col="lsn",
        op_col="op",
        delete_op="DELETE",
        replication=ReplicationSettings(
            host="127.0.0.1", port=PORT, slot=f"live_slot_handoff_v{proto_version}",
            publication="cdc_pub", database="cdc_db",
            batch_size=50, ack_interval_sec=0.2,
            proto_version=proto_version,
            # v2 leg: floor the walsender's decode buffer so the racing
            # DML txns (100-400 row UPDATEs/INSERTs) arrive as STREAMED
            # in-progress transactions during the backfill window — the
            # handoff contract must hold when the stream side is v2
            # buffered/spooled delivery, not just v1 commit bursts
            session_settings=(
                {"logical_decoding_work_mem": "64kB"}
                if proto_version == 2 else {}
            ),
        ),
    )
    c = Connector(spark, cfg, snapshot_df=snap)
    c.start()
    first_client = c._repl_client  # pre-reconnect session, for counters
    try:
        assert c.wait_until_ready(timeout_sec=120)
        t.join(timeout=180)
        assert not writer_err, f"racing writer failed: {writer_err[0]!r}"

        expected = {}
        for i in range(1, 101):
            expected[str(i)] = "updated"
        for i in range(101, 151):
            expected[str(i)] = "seed"
        for i in range(151, 201):
            expected[str(i)] = "updated2"
        for i in range(201, 281):
            expected[str(i)] = "seed"
        pad = "new" + "y" * 1200
        for i in range(301, 401):
            expected[str(i)] = pad
        # ids 281..300: deleted mid-backfill, must NOT appear

        deadline = time.time() + 240
        state: dict = {}
        while time.time() < deadline:
            state = _view_state(c) or {}
            if state == expected:
                break
            time.sleep(0.5)
        assert state == expected, (
            f"handoff view diverged: {len(state)} rows vs "
            f"{len(expected)} expected; "
            f"missing={sorted(set(expected) - set(state), key=int)[:10]}, "
            f"extra={sorted(set(state) - set(expected), key=int)[:10]}, "
            f"wrong={[(k, state[k], expected[k]) for k in state if k in expected and state[k] != expected[k]][:10]}"
        )
        assert c.consumer_error is None
        # zero duplication is structural (keyed view), but prove the
        # count matches too: 400 live ids minus 20 deletes
        assert len(state) == 380
        if proto_version == 2:
            # the v2 leg is only meaningful if the racing DML actually
            # STREAMED. Under full-suite load the 10s wal_sender_timeout
            # can trip mid-test and the supervisor reconnects — counters
            # live per-session, so sum the first and current sessions
            # (the view assertions above already proved delivery); only
            # a >1-reconnect storm leaves a middle session unobserved.
            # sum only DISTINCT sessions: with no reconnect, first_client
            # IS c._repl_client and a naive sum double-counts it
            started = first_client.decoder.stream_txns_started
            if c._repl_client is not first_client:
                started += c._repl_client.decoder.stream_txns_started
            assert started >= 1 or c.consumer_restarts > 1, (
                f"handoff v2 leg never streamed a transaction "
                f"(restarts={c.consumer_restarts})"
            )
    finally:
        c.close()


def test_live_password_authentication_roundtrip(pg):
    """The startup handshake's AuthenticationCleartextPassword branch
    (reference configs carry cdc.password, README.md:186-198) against a
    real backend — previously untested even in the fakes. A dedicated
    role gets a `password`-method hba rule (prepended, so it matches
    before the trust rule; scoped to the role, so every other test keeps
    trust); the client must (a) fail loudly with the documented message
    when no password is configured, (b) fail on a wrong password, and
    (c) complete the handshake and stream a change with the right one."""
    data = os.path.join(pg["work"], "data")
    # no DO-$$ block: the sql() helper routes through bash, where $$
    # expands to the shell PID
    if pg["sql"]("SELECT count(*) FROM pg_roles WHERE rolname='repl_pw'") == "0":
        pg["sql"](
            "CREATE ROLE repl_pw LOGIN REPLICATION SUPERUSER "
            "PASSWORD 'sekrit'"
        )
    r = _su(
        f"sed -i '1i host all repl_pw 127.0.0.1/32 password' {data}/pg_hba.conf"
    )
    assert r.returncode == 0, r.stderr
    pg["sql"]("SELECT pg_reload_conf()")

    def connect_as(password):
        sock = socket.create_connection(("127.0.0.1", PORT), timeout=30)
        sock.settimeout(30)
        client = PG.ReplicationClient(
            sock, slot="live_slot_pw", publication="cdc_pub"
        )
        client.startup(user="repl_pw", database="cdc_db", password=password)
        return client

    # (a) no password configured: the documented loud failure, not a hang
    with pytest.raises(RuntimeError, match="requests a password"):
        connect_as(None)
    # (b) wrong password: the server's ErrorResponse surfaces
    with pytest.raises(RuntimeError, match="startup failed"):
        connect_as("wrong")
    # (c) right password: full replication session over the authed link
    client = connect_as("sekrit")
    try:
        client.create_slot()
        client.start()
        pg["sql"](
            "INSERT INTO users (name, email) VALUES ('pwuser', 'pw@x')",
            db="cdc_db",
        )
        got = _collect(client, 1, deadline_sec=60.0)
        assert got and got[0]["after"]["name"] == "pwuser"
    finally:
        client.close()


def test_live_scram_sha256_authentication_roundtrip(pg):
    """SCRAM-SHA-256 against a real backend (the PG14+ default verifier
    format; managed providers commonly REQUIRE the scram hba method,
    where the cleartext path is refused outright). A dedicated role gets
    a `scram-sha-256` hba rule; the client must complete the full RFC
    5802 exchange — including verifying the server's v= signature — and
    then run a real replication session. Wrong password and no password
    fail loudly."""
    data = os.path.join(pg["work"], "data")
    if pg["sql"]("SELECT count(*) FROM pg_roles WHERE rolname='repl_scram'") == "0":
        pg["sql"](
            "CREATE ROLE repl_scram LOGIN REPLICATION SUPERUSER "
            "PASSWORD 'scrampw'"
        )
    # PG14+ password_encryption defaults to scram-sha-256, but pin it:
    # the stored verifier must BE a scram verifier for the hba method
    assert pg["sql"](
        "SELECT substr(rolpassword, 1, 13) FROM pg_authid "
        "WHERE rolname='repl_scram'"
    ) == "SCRAM-SHA-256"
    r = _su(
        f"sed -i '1i host all repl_scram 127.0.0.1/32 scram-sha-256' "
        f"{data}/pg_hba.conf"
    )
    assert r.returncode == 0, r.stderr
    pg["sql"]("SELECT pg_reload_conf()")

    def connect_as(password):
        sock = socket.create_connection(("127.0.0.1", PORT), timeout=30)
        sock.settimeout(30)
        client = PG.ReplicationClient(
            sock, slot="live_slot_scram", publication="cdc_pub"
        )
        client.startup(
            user="repl_scram", database="cdc_db", password=password
        )
        return client

    with pytest.raises(RuntimeError, match="requests a password"):
        connect_as(None)
    with pytest.raises(RuntimeError, match="startup failed"):
        connect_as("wrong")
    client = connect_as("scrampw")
    try:
        client.create_slot()
        client.start()
        pg["sql"](
            "INSERT INTO users (name, email) VALUES ('scramuser', 'sc@x')",
            db="cdc_db",
        )
        got = _collect(client, 1, deadline_sec=60.0)
        assert got and got[0]["after"]["name"] == "scramuser"
    finally:
        client.close()


def test_live_ssl_require_and_verify_full_roundtrip(pg):
    """TLS on the walsender link against a real backend: enable ssl=on
    with a self-signed cert (IP SAN so verify-full's hostname match can
    pass), then prove BOTH client levels — `require` (encrypt, no peer
    auth) and `verify-full` (CA + hostname) — complete the SSLRequest
    dance, the startup handshake, and a real replication session. Also
    exercises poll()'s SSLSocket.pending() path: with TLS, frames
    buffered inside the SSL layer are invisible to select(), and an
    idle_timeout poll must not stall on them."""
    import subprocess

    data = os.path.join(pg["work"], "data")
    ssldir = tempfile.mkdtemp(prefix="pgssl_")
    crt, key = os.path.join(ssldir, "server.crt"), os.path.join(ssldir, "server.key")
    r = subprocess.run(
        ["openssl", "req", "-new", "-x509", "-days", "2", "-nodes",
         "-out", crt, "-keyout", key, "-subj", "/CN=127.0.0.1",
         "-addext", "subjectAltName=IP:127.0.0.1"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    # the postmaster (postgres user) must own+read them, key mode 0600
    for f, mode in ((crt, "644"), (key, "600")):
        assert _su(f"true").returncode == 0  # su plumbing sanity
        subprocess.run(["cp", f, data], check=True)
        base = os.path.join(data, os.path.basename(f))
        subprocess.run(["chown", "postgres:postgres", base], check=True)
        subprocess.run(["chmod", mode, base], check=True)
    with open(os.path.join(data, "postgresql.conf"), "a") as f:
        f.write("\nssl=on\nssl_cert_file='server.crt'\nssl_key_file='server.key'\n")
    pg["sql"]("SELECT pg_reload_conf()")  # ssl is sighup-context (PG>=10)
    deadline = time.time() + 30
    while time.time() < deadline and pg["sql"]("SHOW ssl") != "on":
        time.sleep(0.3)
    assert pg["sql"]("SHOW ssl") == "on"

    def connect_tls(mode, ca_file=None, slot="live_slot_ssl"):
        sock = socket.create_connection(("127.0.0.1", PORT), timeout=30)
        sock.settimeout(30)
        wrapped = PG.negotiate_ssl(sock, "127.0.0.1", mode, ca_file)
        client = PG.ReplicationClient(wrapped, slot=slot, publication="cdc_pub")
        client.startup(user="postgres", database="cdc_db")
        return client

    # require: encrypted session end to end
    client = connect_tls("require")
    try:
        assert client.sock.version() is not None  # genuinely TLS
        client.create_slot()
        client.start()
        pg["sql"](
            "INSERT INTO users (name, email) VALUES ('ssluser', 'ssl@x')",
            db="cdc_db",
        )
        got = []
        end = time.time() + 60
        # idle_timeout poll: the pending() path must surface frames the
        # TLS layer buffered past the first read
        for ch in client.poll(heartbeat=True, idle_timeout=0.2):
            if ch is not None:
                got.append(ch)
            if got or time.time() > end:
                break
        assert got and got[0]["after"]["name"] == "ssluser"
    finally:
        client.close()

    # verify-full: the self-signed cert IS the CA; hostname must match
    # the IP SAN. A same-slot reconnect also proves slot reuse over TLS.
    client2 = connect_tls("verify-full", ca_file=crt)
    try:
        client2.start()
        pg["sql"](
            "INSERT INTO users (name, email) VALUES ('ssluser2', 'ssl2@x')",
            db="cdc_db",
        )
        # same slot, nothing acked in leg 1: at-least-once redelivers
        # ssluser first — proof the slot state survived the TLS reconnect
        got = _collect(client2, 2, deadline_sec=60.0)
        assert [c["after"]["name"] for c in got] == ["ssluser", "ssluser2"]
    finally:
        client2.close()

    # verify-full against the WRONG CA must fail the TLS handshake
    import ssl as _ssl

    other = tempfile.mkdtemp(prefix="pgssl_other_")
    r = subprocess.run(
        ["openssl", "req", "-new", "-x509", "-days", "2", "-nodes",
         "-out", os.path.join(other, "other.crt"),
         "-keyout", os.path.join(other, "other.key"),
         "-subj", "/CN=127.0.0.1",
         "-addext", "subjectAltName=IP:127.0.0.1"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    with pytest.raises(_ssl.SSLError):
        connect_tls("verify-full", ca_file=os.path.join(other, "other.crt"))


def test_live_tls_plus_scram_combined(pg):
    """The managed-provider shape: TLS transport AND SCRAM auth on one
    session (runs after the ssl and scram tests, so the server already
    has ssl=on and the repl_scram role + scram hba rule). The full
    stack — SSLRequest dance, TLS handshake, SASL SCRAM-SHA-256
    exchange over the encrypted link, replication session — end to end."""
    if pg["sql"]("SHOW ssl") != "on":
        pytest.skip("ssl test did not run first (module order changed)")
    sock = socket.create_connection(("127.0.0.1", PORT), timeout=30)
    sock.settimeout(30)
    wrapped = PG.negotiate_ssl(sock, "127.0.0.1", "require")
    client = PG.ReplicationClient(
        wrapped, slot="live_slot_tls_scram", publication="cdc_pub"
    )
    client.startup(user="repl_scram", database="cdc_db", password="scrampw")
    try:
        client.create_slot()
        client.start()
        pg["sql"](
            "INSERT INTO users (name, email) VALUES ('tslscram', 'ts@x')",
            db="cdc_db",
        )
        got = _collect(client, 1, deadline_sec=60.0)
        assert got and got[0]["after"]["name"] == "tslscram"
    finally:
        client.close()


@pytest.mark.parametrize("proto_version", [1, 2])
def test_live_truncate_tombstone_empties_view_and_acks_advance(
    pg, spark, proto_version
):
    """VERDICT r9 item 4: on_truncate='tombstone_table' applied live. A
    real TRUNCATE on the published table must leave the view holding ONLY
    rows written after it, with the pipeline still acking (flushed_lsn
    advances past the truncate). The v2 leg runs the whole sequence —
    pre-rows, TRUNCATE, post-rows — inside ONE streamed transaction
    (64kB work-mem floor), exercising the in-stream transactional
    tombstone path end-to-end. Default 'ignore' parity is covered by
    test_live_truncate_skipped_but_counted."""
    from go_pq_cdc_elasticsearch_spark.connector import (
        Connector,
        ConnectorConfig,
        ReplicationSettings,
    )

    table = f"trunc_v{proto_version}"
    slot = f"live_slot_trunc_v{proto_version}"
    pg["sql"](
        f"CREATE TABLE IF NOT EXISTS {table} (id int PRIMARY KEY, v text NOT NULL)",
        db="cdc_db",
    )
    pg["sql"](f"ALTER PUBLICATION cdc_pub ADD TABLE {table}", db="cdc_db")
    work = tempfile.mkdtemp(prefix="conn_trunc_")
    cfg = ConnectorConfig(
        staged_dir=os.path.join(work, "staged"),
        view_path=os.path.join(work, "view"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        keys=("id",),
        seq_col="lsn",
        op_col="op",
        delete_op="DELETE",
        processing_time="0 seconds",
        replication=ReplicationSettings(
            host="127.0.0.1", port=PORT, slot=slot,
            publication="cdc_pub", database="cdc_db",
            batch_size=20, ack_interval_sec=0.2,
            proto_version=proto_version,
            on_truncate="tombstone_table",
            session_settings=(
                {"logical_decoding_work_mem": "64kB"}
                if proto_version == 2 else {}
            ),
        ),
    )
    c = Connector(spark, cfg)
    c.start()
    try:
        assert c.wait_until_ready(timeout_sec=120)
        if proto_version == 1:
            for i in range(1, 6):
                pg["sql"](
                    f"INSERT INTO {table} VALUES ({i}, 'pre{i}')", db="cdc_db"
                )
            # the pre-rows must be IN the view before the truncate frame
            # arrives, or the test can't distinguish wipe from never-merge
            deadline = time.time() + 120
            while time.time() < deadline:
                st = _view_state(c) or {}
                if len(st) == 5:
                    break
                time.sleep(0.5)
            assert len(_view_state(c) or {}) == 5
            pg["sql"](f"TRUNCATE {table}", db="cdc_db")
            pg["sql"](
                f"INSERT INTO {table} VALUES (100, 'post100')", db="cdc_db"
            )
            pg["sql"](
                f"INSERT INTO {table} VALUES (101, 'post101')", db="cdc_db"
            )
        else:
            # one streamed txn: 2k pre-rows (past the 64kB work-mem ->
            # streamed), TRUNCATE in-stream, post-rows, COMMIT
            pg["sql"](
                "BEGIN;\n"
                f"INSERT INTO {table} SELECT g, 'pre'||g "
                "FROM generate_series(1, 2000) g;\n"
                f"TRUNCATE {table};\n"
                f"INSERT INTO {table} VALUES (100, 'post100'), (101, 'post101');\n"
                "COMMIT;",
                db="cdc_db",
            )
        expected = {"100": "post100", "101": "post101"}
        deadline = time.time() + 180
        state: dict = {}
        while time.time() < deadline:
            state = _view_state(c) or {}
            if state == expected:
                break
            time.sleep(0.5)
        assert state == expected, (
            f"view after truncate: {len(state)} rows "
            f"(pre leak: {sorted(k for k in state if int(k) < 100)[:5]})"
        )
        assert c.consumer_error is None
        assert c._repl_client.decoder.truncate_skipped >= 1
        # acks keep advancing past the truncate: one more row lands and
        # the flushed frontier moves
        flushed_before = c._repl_client.flushed_lsn
        pg["sql"](f"INSERT INTO {table} VALUES (102, 'post102')", db="cdc_db")
        expected["102"] = "post102"
        deadline = time.time() + 120
        while time.time() < deadline:
            if (_view_state(c) or {}) == expected and (
                c._repl_client.flushed_lsn > flushed_before
            ):
                break
            time.sleep(0.5)
        assert (_view_state(c) or {}) == expected
        assert c._repl_client.flushed_lsn > flushed_before
    finally:
        c.close()


def test_live_standby_takeover_slot_fenced_no_loss_no_dup(pg, spark):
    """U3 closure (VERDICT r9 item 5): the reference's active/passive
    max-2-instance deployment (docs/production_tutorial.md:115-129) on
    the engine's single-writer design. (1) A standby Connector starting
    against the SAME slot + checkpoint while the active is alive must
    fail loudly with sqlstate 55006 BEFORE its Spark query (and hence the
    shared checkpoint) is touched — the active keeps streaming,
    undisturbed. (2) After the active dies abruptly (SIGKILL emulation:
    supervisor stopped, socket dropped with no protocol goodbye, query
    killed), start_as_standby wins the slot and resumes from the shared
    checkpoint + slot with no loss and no duplicates."""
    from go_pq_cdc_elasticsearch_spark.connector import (
        Connector,
        ConnectorConfig,
        ReplicationSettings,
    )
    from go_pq_cdc_elasticsearch_spark.sources.pgoutput import (
        ReplicationStreamError,
    )

    table = "takeover"
    slot = "live_slot_takeover"
    pg["sql"](
        f"CREATE TABLE IF NOT EXISTS {table} (id int PRIMARY KEY, v text NOT NULL)",
        db="cdc_db",
    )
    pg["sql"](f"ALTER PUBLICATION cdc_pub ADD TABLE {table}", db="cdc_db")
    work = tempfile.mkdtemp(prefix="conn_takeover_")

    def cfg():
        return ConnectorConfig(
            staged_dir=os.path.join(work, "staged"),
            view_path=os.path.join(work, "view"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            keys=("id",),
            seq_col="lsn",
            op_col="op",
            delete_op="DELETE",
            processing_time="0 seconds",
            replication=ReplicationSettings(
                host="127.0.0.1", port=PORT, slot=slot,
                publication="cdc_pub", database="cdc_db",
                batch_size=5, ack_interval_sec=0.2,
            ),
        )

    active = Connector(spark, cfg())
    active.start()
    standby = Connector(spark, cfg())
    try:
        assert active.wait_until_ready(timeout_sec=120)
        pg["sql"](f"INSERT INTO {table} VALUES (1, 'a1')", db="cdc_db")
        deadline = time.time() + 120
        while time.time() < deadline and (_view_state(active) or {}) != {"1": "a1"}:
            time.sleep(0.5)
        assert (_view_state(active) or {}) == {"1": "a1"}

        # (1) second instance against the live slot: LOUD, pre-query
        with pytest.raises(ReplicationStreamError) as ei:
            standby.start()
        assert ei.value.sqlstate == "55006"
        assert standby._query is None  # Spark query never started
        assert standby._repl_client is None  # walsender session released

        # the refused attempt corrupted nothing: the active still streams
        pg["sql"](f"INSERT INTO {table} VALUES (2, 'a2')", db="cdc_db")
        deadline = time.time() + 120
        while time.time() < deadline and len(_view_state(active) or {}) != 2:
            time.sleep(0.5)
        assert (_view_state(active) or {}) == {"1": "a1", "2": "a2"}
        assert active.consumer_error is None

        # (2) SIGKILL emulation of the active: no graceful close() — stop
        # the supervisor (a dead process reconnects nothing), kill the
        # query (dies with the process), drop the socket (the OS sends
        # FIN on process death; no final ack sweep, no CopyDone)
        active._repl_stop.set()
        active._query.stop()
        active._repl_client.sock.close()
        active._repl_thread.join(timeout=30)

        # a row written while NOBODY consumes: the takeover must deliver
        # it (the slot retains WAL from confirmed_flush)
        pg["sql"](f"INSERT INTO {table} VALUES (3, 'gap')", db="cdc_db")

        standby.start_as_standby(poll_interval_sec=1.0, timeout_sec=180)
        assert standby.wait_until_ready(timeout_sec=120)
        pg["sql"](f"INSERT INTO {table} VALUES (4, 'b4')", db="cdc_db")
        expected = {"1": "a1", "2": "a2", "3": "gap", "4": "b4"}
        deadline = time.time() + 180
        state: dict = {}
        while time.time() < deadline:
            state = _view_state(standby) or {}
            if state == expected:
                break
            time.sleep(0.5)
        # no loss (3 delivered across the gap, 4 post-takeover) and no
        # dup (keyed view; the count equals the distinct id count)
        assert state == expected, (
            f"state={state} consumer_error={standby.consumer_error!r} "
            f"restarts={standby.consumer_restarts} "
            f"q_active={standby._query is not None and standby._query.isActive} "
            f"q_exc={standby._query.exception() if standby._query else None} "
            f"segments={sorted(os.listdir(os.path.join(work, 'staged')))[-5:]}"
        )
        assert standby.consumer_error is None
    finally:
        standby.close()
        try:
            active.close()
        except Exception:
            pass


def test_live_zombie_active_fenced_after_takeover(pg, spark):
    """U3 fencing closure (review r11): the README runbook's caveat was
    that the slot only proves the active's replication CONNECTION is
    gone — an active whose connection died (network partition, server-
    side pg_terminate_backend, a SIGSTOP'd host) but whose Spark query
    is STILL RUNNING could keep writing to the shared view after a
    standby takes over. The view-level fence now kills it.

    Scenario (the SIGSTOP shape, in-process): (1) active streams; (2) its
    walsender is terminated server-side while its Spark query stays alive
    — the zombie state; (3) the standby wins the freed slot, bumping the
    view's fence generation; (4) the zombie's next merge — fed by the
    very segments the standby's consumer stages into the SHARED staged
    dir — dies loudly with FencedWriterError before touching a bucket;
    (5) the view holds exactly the expected rows, written only by the
    new active. Single-JVM emulation note: Spark refuses two live
    queries on one checkpoint dir inside one JVM (an accidental local
    guard a two-host deployment does not have), so the standby resumes
    from a file-level copy of the shared checkpoint taken at takeover —
    the shared VIEW is the resource the fence protects."""
    from go_pq_cdc_elasticsearch_spark.connector import (
        Connector,
        ConnectorConfig,
        ReplicationSettings,
    )
    from go_pq_cdc_elasticsearch_spark.sink.materialized import read_fence

    table = "zombiefence"
    slot = "live_slot_zombie"
    pg["sql"](
        f"CREATE TABLE IF NOT EXISTS {table} (id int PRIMARY KEY, v text NOT NULL)",
        db="cdc_db",
    )
    pg["sql"](f"ALTER PUBLICATION cdc_pub ADD TABLE {table}", db="cdc_db")
    work = tempfile.mkdtemp(prefix="conn_zombie_")

    def cfg(ckpt: str):
        return ConnectorConfig(
            staged_dir=os.path.join(work, "staged"),
            view_path=os.path.join(work, "view"),
            checkpoint_dir=os.path.join(work, ckpt),
            keys=("id",),
            seq_col="lsn",
            op_col="op",
            delete_op="DELETE",
            processing_time="0 seconds",
            replication=ReplicationSettings(
                host="127.0.0.1", port=PORT, slot=slot,
                publication="cdc_pub", database="cdc_db",
                batch_size=5, ack_interval_sec=0.2,
            ),
        )

    active = Connector(spark, cfg("ckpt"))
    active.start()
    standby = None
    try:
        assert active.wait_until_ready(timeout_sec=120)
        pg["sql"](f"INSERT INTO {table} VALUES (1, 'a1')", db="cdc_db")
        deadline = time.time() + 120
        while time.time() < deadline and (_view_state(active) or {}) != {"1": "a1"}:
            time.sleep(0.5)
        assert (_view_state(active) or {}) == {"1": "a1"}
        assert read_fence(os.path.join(work, "view")) == 1

        # (2) partition the active: supervisor told not to reconnect
        # FIRST (a zombie that re-won the slot would just be the active
        # again), then the walsender is killed server-side. The Spark
        # query is deliberately left RUNNING.
        active._repl_stop.set()
        pg["sql"](
            "SELECT pg_terminate_backend(active_pid) FROM pg_replication_slots"
            f" WHERE slot_name='{slot}' AND active_pid IS NOT NULL"
        )
        deadline = time.time() + 60
        while time.time() < deadline and pg["sql"](
            f"SELECT active FROM pg_replication_slots WHERE slot_name='{slot}'"
        ) != "f":
            time.sleep(0.5)
        assert active._query.isActive  # the zombie half: query still up

        # a row written while nobody consumes — the takeover must carry it
        pg["sql"](f"INSERT INTO {table} VALUES (2, 'gap')", db="cdc_db")

        # (3) takeover from a copy of the shared checkpoint (see note).
        # The copy keeps the offset/commit frontier but gets a FRESH
        # query id (the metadata file is dropped): inside one JVM, Spark's
        # stopActiveRunOnRestart treats a same-id start as a restart and
        # politely STOPS the zombie's run — a courtesy two separate hosts
        # do not extend each other, and exactly what this test must not
        # rely on. The view's lineage guard absorbs the id change (known
        # lineage change resets the epoch frontier; the LWW merge is
        # idempotent under the redelivery).
        shutil.copytree(
            os.path.join(work, "ckpt"), os.path.join(work, "ckpt_standby")
        )
        os.remove(os.path.join(work, "ckpt_standby", "metadata"))
        # the sidecar checksum must go with it, or Hadoop's local
        # ChecksumFileSystem refuses to atomically create the fresh
        # metadata file (FileAlreadyExists on the stale .crc)
        os.remove(os.path.join(work, "ckpt_standby", ".metadata.crc"))
        standby = Connector(spark, cfg("ckpt_standby"))
        standby.start_as_standby(poll_interval_sec=1.0, timeout_sec=180)
        assert standby.wait_until_ready(timeout_sec=120)
        assert read_fence(os.path.join(work, "view")) == 2

        # (4) post-takeover traffic: the standby's consumer stages it into
        # the SHARED dir, so the zombie's query wakes up on it and must
        # die on the fence instead of merging
        pg["sql"](f"INSERT INTO {table} VALUES (3, 'b3')", db="cdc_db")
        expected = {"1": "a1", "2": "gap", "3": "b3"}
        deadline = time.time() + 180
        state: dict = {}
        while time.time() < deadline:
            state = _view_state(standby) or {}
            if state == expected and not active._query.isActive:
                break
            time.sleep(0.5)
        assert state == expected, (
            f"state={state} standby_err={standby.consumer_error!r} "
            f"zombie_active={active._query.isActive}"
        )
        assert not active._query.isActive, "zombie query survived the fence"
        exc = active._query.exception()
        assert exc is not None
        assert "FencedWriterError" in str(exc) or "fenced" in str(exc)
        assert standby.consumer_error is None
        assert standby._query.isActive
    finally:
        if standby is not None:
            standby.close()
        try:
            active.close()
        except Exception:
            pass


def test_live_logical_messages_envelope_roundtrip(pg):
    """on_message='envelope' (r11): pg_logical_emit_message frames are
    decoded live. A transactional message is positioned INSIDE its
    transaction (here: after the INSERT it was emitted with, stamped with
    the commit ts); a non-transactional one is delivered at its own WAL
    position with no txn context. Default mode never asks the server for
    the frames at all (reference parity — dropped like Origin/Type)."""
    import base64

    sock = socket.create_connection(("127.0.0.1", PORT), timeout=30)
    sock.settimeout(30)
    client = PG.ReplicationClient(
        sock, slot="live_slot_msg", publication="cdc_pub",
        on_message="envelope",
    )
    client.startup(user="postgres", database="cdc_db")
    client.create_slot()
    client.start()
    try:
        # one transaction: row + transactional in-band watermark
        pg["sql"](
            "INSERT INTO users (name, email) VALUES ('msg1', 'm@x.com'); "
            "SELECT pg_logical_emit_message(true, 'wm', 'batch-42');",
            db="cdc_db",
        )
        # outside any transaction of interest: immediate signal
        pg["sql"](
            "SELECT pg_logical_emit_message(false, 'sig', 'pause');",
            db="cdc_db",
        )
        got = _collect(client, 3)
        assert [c["op"] for c in got] == ["INSERT", "MESSAGE", "MESSAGE"]
        ins, txm, sig = got
        assert ins["after"]["name"] == "msg1"
        assert txm["after"]["prefix"] == "wm"
        assert base64.b64decode(txm["after"]["content_b64"]) == b"batch-42"
        assert txm["after"]["transactional"] == "true"
        assert int(txm["after"]["message_lsn"]) > 0
        assert txm["table_schema"] is None and txm["table_name"] is None
        assert txm["ts"] is not None and txm["ts"].startswith("20")
        assert sig["after"]["prefix"] == "sig"
        assert base64.b64decode(sig["after"]["content_b64"]) == b"pause"
        assert sig["after"]["transactional"] == "false"
        # stamps stay monotone through the message frames
        assert got[0]["lsn"] < got[1]["lsn"] < got[2]["lsn"]
        assert client.decoder.messages_skipped == 0
    finally:
        client.close()

    # default mode: the server is not even asked for Message frames —
    # the emitted signals above never reach a fresh default-mode slot
    client2 = _connect("live_slot_msg_default")
    client2.create_slot()
    client2.start()
    try:
        pg["sql"](
            "SELECT pg_logical_emit_message(false, 'sig', 'x');"
            "INSERT INTO users (name, email) VALUES ('msg2', 'm2@x.com');",
            db="cdc_db",
        )
        got = _collect(client2, 1)
        assert [c["op"] for c in got] == ["INSERT"]
        assert got[0]["after"]["name"] == "msg2"
    finally:
        client2.close()
