"""Back-compat facade over the family-split query catalog.

The catalog itself lives in :mod:`amazon_s3_find_and_forget_spark.catalog`
— one module per family (``findforget``, ``tpch``, ``events``, ``text``,
``dedup``, ``similarity``) plus the shared loaders in
``catalog/loader.py`` — assembled there into the driver-facing
``QUERIES`` / ``ORACLES`` registries in an explicit gate order. This
module re-exports the public surface (`__spark_entry__.py`, ``bench.py``
and ``tools/check_oracle.py`` import from here) so the split is
invisible to callers.
"""

from __future__ import annotations

from .catalog import (  # noqa: F401
    MATCH_ORDERKEYS,
    ORACLES,
    QUERIES,
    TABLES,
    load,
)
from .catalog.loader import (  # noqa: F401
    _dec2dbl,
    _ensure_session_confs,
    _load_events_via_arrow,
    _normalize_ts,
)
