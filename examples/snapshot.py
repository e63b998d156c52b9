"""Migration of the reference's `example/snapshot`
(example/snapshot/main.go): `initial` mode — consistent chunked snapshot of
pre-existing rows, then seamless CDC from the captured point
(snapshot rows arrive first, stream events after; the handoff overlap is
resolved by seq, README.md:36-47).

Run: python examples/snapshot.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.connector import Connector, ConnectorConfig
from go_pq_cdc_elasticsearch_spark.session import get_spark
from go_pq_cdc_elasticsearch_spark.sources.replay import stage_event_files
from go_pq_cdc_elasticsearch_spark.sources.snapshot import snapshot_read


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example-snapshot", cpus=4)
    work = tempfile.mkdtemp(prefix="ex_snapshot_")

    cfg = ConnectorConfig(
        staged_dir=os.path.join(work, "staged"),
        view_path=os.path.join(work, "view"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        snapshot_mode="initial",  # cdc.snapshot.mode: initial
    )
    stage_event_files(spark, sf_dir, cfg.staged_dir, n_files=2)

    # the pre-existing rows (upstream: pg_export_snapshot + chunked workers;
    # here: the chunked snapshot source over the same table)
    events = load_table(spark, sf_dir, "events")
    mid = events.agg(F.avg("event_id")).collect()[0][0]
    snapshot_df = snapshot_read(spark, sf_dir, "events", chunk_size=1000).filter(
        F.col("event_id") <= mid
    )

    connector = Connector(spark, cfg, snapshot_df=snapshot_df)
    connector.start(available_now=True)
    connector.await_drained()
    connector.close()

    print("state after snapshot backfill + CDC handoff:")
    connector.read().orderBy("user_id").show(10, truncate=False)


if __name__ == "__main__":
    main(*sys.argv[1:])
