"""qrapids_forecast_r_script_spark — PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference ``q-rapids/qrapids-forecast-R_script``
(``/root/reference/TimeSeriesFunctions_GPL_0.5.1.R``), generalized to a
distributed, 100 TB-scale design:

- relational layer: pure DataFrame/SQL, optimized by Catalyst (no RDDs)
- forecast layer: grouped ``applyInPandas`` — one task per series, pure
  numpy model implementations (the container has no statsmodels/scipy)
- LLM-data-pipeline layer: dedup / similarity / text analysis operators
- streaming layer: Structured Streaming over the ``events`` table

Public API: :class:`Engine` plus the operator modules.
"""

from .version import __version__
from .session import get_spark
from .engine import Engine

__all__ = ["__version__", "get_spark", "Engine"]
