"""Storage factory (reference: /root/reference/jorvik/storage/__init__.py:12-44).

``configure()`` builds the storage stack from Spark conf:

* ``io.jorvik.data_lineage.log_path``      — attach DataLineageLogger when set
* ``io.jorvik.storage.production_context`` — comma list of contexts that
  are NOT sandboxed (default ``main,master,production,prod``)
* ``io.jorvik.storage.isolation_provider`` — provider registry key

The ``io.jorvik.*`` conf keys are kept verbatim so reference users can
switch engines without touching cluster config.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

from jorvik_spark.storage.basic import BasicStorage
from jorvik_spark.storage.isolation import IsolatedStorage
from jorvik_spark.storage.isolation_providers import (
    get_isolation_provider,
    get_spark_config,
)
from jorvik_spark.storage.protocols import Storage

LINEAGE_LOG_PATH_CONF = "io.jorvik.data_lineage.log_path"
PRODUCTION_CONTEXT_CONF = "io.jorvik.storage.production_context"
DEFAULT_PRODUCTION_CONTEXTS = "main,master,production,prod"


def configure(
    isolation_provider: Optional[Callable[[], str]] = None,
    verbose: bool = False,
    track_lineage: bool = True,
) -> Union[BasicStorage, IsolatedStorage]:
    """Build BasicStorage, optionally lineage-tracked and isolation-wrapped.

    The current context is sandboxed (IsolatedStorage) unless it is empty
    or in the production-context list.
    """
    st = BasicStorage()
    # Session conf beats context conf (Q12) — also makes both keys settable
    # at runtime, which the reference's context-only read prevents.
    lineage_log_path = get_spark_config(LINEAGE_LOG_PATH_CONF, default_value="")
    production_contexts = [
        p.strip().lower()
        for p in get_spark_config(
            PRODUCTION_CONTEXT_CONF, default_value=DEFAULT_PRODUCTION_CONTEXTS
        ).split(",")
    ]

    if track_lineage and lineage_log_path:
        from jorvik_spark.data_lineage.observer import DataLineageLogger

        st.register_output_observer(DataLineageLogger(lineage_log_path))

    if isolation_provider is None:
        isolation_provider = get_isolation_provider()

    context = isolation_provider()
    if context and context.lower() not in production_contexts:
        return IsolatedStorage(
            st, verbose=verbose, isolation_provider=isolation_provider
        )
    return st


__all__ = ["Storage", "BasicStorage", "IsolatedStorage", "configure"]
