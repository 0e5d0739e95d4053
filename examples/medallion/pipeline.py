"""The pipeline DAG, run in dependency order.

Reference: pipeline.yaml — there a Databricks job wires the four
notebooks; here a plain function (or any orchestrator calling the stage
factories) does the same:

    ingest_raw_orders ─┐
                       ├─> clean_orders ─> create_customer_summary
    ingest_raw_customers ──────────────────────^
"""

from __future__ import annotations

from examples.medallion import (
    nb_clean_orders,
    nb_create_customer_summary,
    nb_ingest_raw_customers,
    nb_ingest_raw_orders,
)


def run_pipeline(sf_dir: str, lake: str) -> None:
    nb_ingest_raw_orders.build(sf_dir, lake).run()
    nb_ingest_raw_customers.build(sf_dir, lake).run()
    nb_clean_orders.build(lake).run()
    nb_create_customer_summary.build(lake).run()
