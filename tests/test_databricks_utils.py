"""Off-platform behavior of the Databricks utils (A33): every accessor
must fail with an actionable DatabricksUtilsError, and the Databricks
isolation providers must surface it lazily (reference contract:
/root/reference/jorvik/utils/databricks.py:8-13)."""

import pytest

from jorvik_spark.storage.isolation_providers import PROVIDERS
from jorvik_spark.utils import databricks as dbx


def test_get_spark_returns_active_session(spark):
    assert dbx.get_spark() is spark


def test_get_dbutils_raises_off_platform(spark):
    with pytest.raises(dbx.DatabricksUtilsError, match="Databricks notebook"):
        dbx.get_dbutils()


def test_notebook_accessors_raise_off_platform(spark):
    for fn in (
        dbx.get_notebook_context,
        dbx.get_active_branch,
        dbx.get_current_user,
        dbx.get_cluster_id,
        dbx.get_notebook_path,
    ):
        with pytest.raises(dbx.DatabricksUtilsError):
            fn()


def test_databricks_providers_fail_lazily(spark):
    # Configuring them is fine; invoking them off-platform raises clearly.
    for name in ("DATABRICKS_GIT_BRANCH", "DATABRICKS_USER", "DATABRICKS_CLUSTER"):
        with pytest.raises(dbx.DatabricksUtilsError):
            PROVIDERS[name]()
