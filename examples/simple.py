"""Migration of the reference's `example/simple` (example/simple/main.go):
consume a change stream, enrich each document with an `operation` field,
upsert/delete into a keyed index — here the engine's materialized view.

Run: python examples/simple.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from go_pq_cdc_elasticsearch_spark.connector import Connector, ConnectorConfig
from go_pq_cdc_elasticsearch_spark.session import get_spark
from go_pq_cdc_elasticsearch_spark.sources.replay import stage_event_files


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example-simple", cpus=4)
    work = tempfile.mkdtemp(prefix="ex_simple_")

    # the reference config block (example/simple/main.go:60-100) maps to:
    cfg = ConnectorConfig(
        staged_dir=os.path.join(work, "staged"),   # change feed (slot)
        view_path=os.path.join(work, "view"),      # the "index"
        checkpoint_dir=os.path.join(work, "ckpt"), # LSN/ack state
        table_index_mapping={"public.events": "events-idx"},
    )
    stage_event_files(spark, sf_dir, cfg.staged_dir, n_files=2)

    connector = Connector(spark, cfg)
    connector.start(available_now=True)   # cdc.Start(ctx)
    connector.wait_until_ready()          # connector.WaitUntilReady(ctx)
    connector.await_drained()
    connector.close()                     # connector.Close()

    print("materialized state (last write per key, deletes removed):")
    connector.read().orderBy("user_id").show(10, truncate=False)


if __name__ == "__main__":
    main(*sys.argv[1:])
