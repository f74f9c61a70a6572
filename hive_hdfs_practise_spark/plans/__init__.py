"""Query plan registry — the engine's public query surface.

Importing this package registers every implemented query. Each entry
pairs a PySpark plan builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string (run by DuckDB against the same
parquet) used as the correctness gate.
"""

from .registry import ORACLES, QUERIES, register  # noqa: F401

# Import for registration side effects — order roughly mirrors
# SURVEY.md §2's inventory.
from . import relational  # noqa: F401,E402
from . import analytics  # noqa: F401,E402
from . import tpch  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import chunks  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import streaming_plans  # noqa: F401,E402
from . import advanced  # noqa: F401,E402
from . import scalars  # noqa: F401,E402
from . import distinct  # noqa: F401,E402
from . import json_ops  # noqa: F401,E402
from . import sampling_plans  # noqa: F401,E402
from . import stats  # noqa: F401,E402
from . import pipeline  # noqa: F401,E402
