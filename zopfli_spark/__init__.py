"""zopfli_spark — a PySpark-native per-column lightweight-compression engine.

Built from scratch against the computational ideas of stgiga/zopfli (Zopfli
KrzYmod): exact bit-cost codec auto-selection, cost-based split-point search,
iterate-with-stats-feedback, and a resume database — re-expressed as idiomatic
Spark dataflow (DataFrames + Arrow-vectorized pandas UDFs). See SURVEY.md.
"""

__version__ = "0.1.0"

from .config import DEFAULT_CONFIG, EngineConfig  # noqa: F401,E402
from .engine import (  # noqa: F401,E402
    decode_table,
    encode_table,
    metrics_table,
    roundtrip_check,
)
