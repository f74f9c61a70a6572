"""Query plan registry — the engine's public query surface.

Importing this package registers every implemented query. Each entry
pairs a PySpark plan builder ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string (run by DuckDB against the same
parquet) used as the correctness gate.
"""

from .registry import ORACLES, QUERIES, register  # noqa: F401

# Import for registration side effects. ORDER IS LOAD-BEARING: the
# driver's correctness gate walks the registry in registration order
# under a budget — round 1 stopped after the 50th entry, leaving the
# tail driver-unverified. Round-1-unchecked modules therefore
# register FIRST (cheap ones before expensive ones), and the modules
# that already hold green CORRECTNESS_r01 rows go last. relational
# stays first because its `order_detail_nested` was round 1's one
# red row and needs a fresh green row.
from . import relational  # noqa: F401,E402  (8 fast; re-green order_detail_nested)
from . import scalars  # noqa: F401,E402
from . import json_ops  # noqa: F401,E402
from . import distinct  # noqa: F401,E402
from . import sampling_plans  # noqa: F401,E402
from . import stats  # noqa: F401,E402
from . import chunks  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import advanced  # noqa: F401,E402
from . import text  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import pipeline  # noqa: F401,E402
from . import streaming_plans  # noqa: F401,E402
# --- below here: fully driver-green in round 1 ---
from . import analytics  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import tpch  # noqa: F401,E402
