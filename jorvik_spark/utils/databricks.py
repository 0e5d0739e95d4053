"""Databricks runtime introspection (reference: /root/reference/jorvik/
utils/databricks.py:1-79).

Every accessor funnels through the notebook context that ``dbutils``
exposes; outside a Databricks notebook environment (this repo's CI, local
Spark) they raise :class:`DatabricksUtilsError` with actionable wording
instead of an attribute error three frames deep. The isolation providers
(``storage/isolation_providers.py``) call these lazily, so merely
*configuring* a Databricks provider off-platform is fine — only invoking
it raises.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession


class DatabricksUtilsError(Exception):
    """A Databricks-only utility was used outside a Databricks runtime."""

    def __init__(self, error: str = None):
        super().__init__(
            f"{error}. Ensure you are running this code in a Databricks "
            "notebook environment."
        )


def get_spark() -> SparkSession:
    """Active session or a clear error (never builds one — on Databricks
    the runtime owns session lifecycle)."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        raise DatabricksUtilsError("No active Spark session found")
    return spark


def get_dbutils() -> Any:
    """The ``dbutils`` client: Spark-Connect client flavor when
    ``spark.databricks.service.client.enabled`` is true, else the notebook
    IPython user namespace."""
    spark = get_spark()
    try:
        client_config = spark.conf.get(
            "spark.databricks.service.client.enabled", None
        )
    except Exception:
        client_config = None

    try:
        if client_config == "true":
            from pyspark.dbutils import DBUtils  # type: ignore

            return DBUtils.SparkServiceClientDBUtils(spark.sparkContext)
        import IPython  # type: ignore

        return IPython.get_ipython().user_ns["dbutils"]
    except Exception:
        raise DatabricksUtilsError(
            "Could not determine the dbutils client configuration"
        ) from None


def get_notebook_context() -> dict:
    """Current notebook context as a plain dict (tags, extraContext)."""
    return json.loads(
        get_dbutils().notebook.entry_point.getDbutils().notebook().getContext().toJson()
    )


def get_active_branch() -> str:
    """Git branch of a Repos-backed notebook; '' for workspace (non-git)
    paths — the no-isolation signal for production jobs."""
    context = get_notebook_context()
    return context["extraContext"].get("mlflowGitReference", "")


def get_current_user() -> str:
    return get_notebook_context()["tags"]["user"]


def get_cluster_id() -> str:
    return get_notebook_context()["tags"]["clusterId"]


def get_notebook_path() -> str:
    return get_notebook_context()["extraContext"]["notebook_path"]
