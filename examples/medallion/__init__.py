"""Full medallion-architecture port of the reference's flagship example.

Mirrors /root/reference/examples/databricks/transactions/ end-to-end —
bronze ingest (nb_ingest_raw_transactions.py, nb_ingest_raw_customers.py)
→ silver clean (nb_clean_transactions.py) → gold summary with a MERGE
sink (nb_create_customer_summary.py) — re-expressed over the driver
testdata tables with a schema-declared `@etl` hop per stage and one
module per notebook (the reference's nb_-prefix / schemas-package layout).

Differences from the simpler ``examples/orders_pipeline.py`` (which
covers the shape only):

* one module per notebook, named after the produced table — the
  reference's navigability convention;
* declared schemas live in ``schemas.py`` so producers and consumers
  share one definition (reference bronze/schemas, silver/schemas);
* the gold hop is a ``MergeDeltaOutput`` UPSERT, not an overwrite — the
  production medallion pattern where the summary converges under
  scheduled re-runs and late-arriving bronze data (Delta MERGE when
  delta-spark is installed; the storage layer's relational merge on
  parquet otherwise — same semantics either way);
* every stage has a ``smoke_test_etl`` schema check in
  tests/test_medallion_example.py, the reference's per-notebook test
  pattern (transactions/tests/*).

Paths are injected by stage factories instead of module-scope constants:
the reference's ``/mnt/bronze`` globals are a Databricks mount
convention, not part of the semantics.
"""

from examples.medallion.pipeline import run_pipeline  # noqa: F401
