"""Migration of the reference's `example/script-update`
(example/script-update/main.go): a Painless script maintains a version
counter and stock delta per product document. The engine evaluates the same
semantics as merge expressions (SURVEY.md R14 / Q-C4); live-ES mode would
pass the script through verbatim via handlers.script_update_handler.

Run: python examples/script_update.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from go_pq_cdc_elasticsearch_spark.catalog import load_table
from go_pq_cdc_elasticsearch_spark.operators.cdc import scripted_update_merge
from go_pq_cdc_elasticsearch_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example-script-update", cpus=4)
    events = load_table(spark, sf_dir, "events")

    # ctx._source.version += 1; ctx._source.stock += params.delta
    # (example/script-update/main.go:130-183) == per-key merge aggregation:
    result = scripted_update_merge(events, update_op="purchase")
    print("per-document version counter + stock (script-update semantics):")
    result.orderBy("user_id").show(10, truncate=False)


if __name__ == "__main__":
    main(*sys.argv[1:])
