"""Query catalog: importing this package registers every query.

``catalog.REGISTRY`` maps name → Query(fn, oracle_sql, tags); the driver
contract (``__spark_entry__.py``) and the local parity tests both read
from it, so the set the driver checks is exactly the set we test.
"""

from . import meter_queries  # noqa: F401
from . import tpch_queries  # noqa: F401
from . import analytics_queries  # noqa: F401
from . import events_queries  # noqa: F401
from . import source_queries  # noqa: F401
from . import text_queries  # noqa: F401
from . import vector_queries  # noqa: F401
from . import graph_queries  # noqa: F401
from .catalog import REGISTRY, Query, register  # noqa: F401
